package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Text-analysis suite over the `documents` fixture: token counting,
  * quality scoring, marker-based language ID, positional fingerprinting,
  * and the multimodal metadata plumbing (binary column + typed metadata).
  */
object TextQueries {

  val all: Seq[GQuery] = Seq(

    // ---- token counting (whitespace + BPE-ish regex) --------------------
    GQuery("q37_text_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws_tokens"),
          TextAnalysis.bpeishCount(col("text")).cast("long").as("n_bpeish"),
          length(col("text")).cast("long").as("n_chars_m"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpeish,
             |  CAST(length(text) AS BIGINT) AS n_chars_m
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "row-local tokenization, codegen'd builtins, no UDF"),

    // ---- quality scoring ------------------------------------------------
    GQuery("q38_text_quality",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, round(
             |  0.5 * (len(list_filter(string_split(text, ' '),
             |         x -> list_contains(['the','a','of','and','to','in','is'], x)))
             |         / CAST(len(string_split(text, ' ')) AS DOUBLE))
             |  + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE), 100.0) / 100.0
             |  + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
             |           / CAST(greatest(length(text), 1) AS DOUBLE)), 6) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "linear quality score (length/stopword/punct) — no transcendentals, bit-reproducible"),

    // ---- language ID ----------------------------------------------------
    GQuery("q39_text_langid",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      Some("""WITH sc AS (SELECT doc_id, lang,
             |  len(list_filter(string_split(lower(text), ' '),
             |      x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
             |  len(list_filter(string_split(lower(text), ' '),
             |      x -> list_contains(['le','la','les','de','et','un','une'], x))) AS s_fr,
             |  len(list_filter(string_split(lower(text), ' '),
             |      x -> list_contains(['el','los','las','de','y','uno','una'], x))) AS s_es,
             |  len(list_filter(string_split(lower(text), ' '),
             |      x -> list_contains(['der','die','das','und','ein','zu'], x))) AS s_de
             |  FROM documents)
             |SELECT doc_id, lang,
             |  CASE
             |    WHEN s_en >= greatest(s_en, s_fr, s_es, s_de) AND s_en > 0 THEN 'en'
             |    WHEN s_fr >= greatest(s_en, s_fr, s_es, s_de) AND s_fr > 0 THEN 'fr'
             |    WHEN s_es >= greatest(s_en, s_fr, s_es, s_de) AND s_es > 0 THEN 'es'
             |    WHEN s_de >= greatest(s_en, s_fr, s_es, s_de) AND s_de > 0 THEN 'de'
             |    ELSE 'und' END AS pred_lang
             |FROM sc ORDER BY doc_id""".stripMargin),
      doc = "marker-word n-gram heuristic language ID; fixed argmax tie-break en>fr>es>de"),

    // ---- positional fingerprint ----------------------------------------
    GQuery("q40_text_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pt AS (SELECT doc_id, i AS pos1, t[i] AS tok
             |       FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
             |dict AS (SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tid
             |         FROM (SELECT DISTINCT tok FROM pt)),
             |j AS (SELECT doc_id, pos1, tid FROM pt JOIN dict USING (tok))
             |SELECT doc_id,
             |  CAST(sum(pos1 * tid) % 2147483647 AS BIGINT) AS fingerprint,
             |  count(*) AS n_tokens
             |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "order-sensitive rolling-hash-style fingerprint, pure int64 math"),

    // ---- TF-IDF ---------------------------------------------------------
    GQuery("q48_tfidf",
      (s, d) => TextAnalysis.tfidf(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "tok"),
      Some("""WITH tf AS (SELECT doc_id, tok, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents) GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, tok, tf, df,
             |  round(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
             |FROM tf JOIN dfreq USING (tok), n
             |ORDER BY doc_id, tok""".stripMargin),
      doc = "TF-IDF: two hash aggs + tok join, 1-row corpus count broadcast; no dictionary, no global sort"),

    // ---- grouped percentiles (per-language length quantiles) ------------
    GQuery("q59_grouped_percentiles",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          size(TextAnalysis.tokens(col("text"))).cast("double").as("n_toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(percentile(col("n_toks"), lit(0.25)), 4).as("p25"),
          round(percentile(col("n_toks"), lit(0.5)), 4).as("p50"),
          round(percentile(col("n_toks"), lit(0.75)), 4).as("p75"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  round(quantile_cont(len(string_split(text, ' ')), 0.25), 4) AS p25,
             |  round(quantile_cont(len(string_split(text, ' ')), 0.5), 4) AS p50,
             |  round(quantile_cont(len(string_split(text, ' ')), 0.75), 4) AS p75
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "per-group exact percentiles (doc-length quantiles per language) — one hash aggregation, the per-stratum profiling op of a curation pipeline"),

    // ---- multimodal metadata plumbing -----------------------------------
    GQuery("q41_multimodal_meta",
      (s, d) => graft.ext.Multimodal.withDecodedMeta(
          Tables.documents(s, d)
            .select(col("doc_id"),
              encode(col("text"), "UTF-8").as("payload"),
              col("source")))
        .select("doc_id", "byte_len", "fake_width", "fake_height", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
             |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS fake_height,
             |  source
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "binary payload column + typed metadata; decode itself is stubbed (no codec libs in container)")
  )
}
