package graft

import java.nio.file.{Files, Paths}

/** Generates QUERIES.md — the catalog of every registered query (name,
  * oracle discipline, one-line design note) straight from the registry,
  * so the doc can never drift from the code. Usage:
  * `runMain graft.Docs [outPath]`. */
object Docs {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "QUERIES.md"
    val rows = QueryRegistry.all.map { q =>
      val oracle = if (q.oracle.isDefined) "DuckDB hash" else "rows-only (ML)"
      s"| `${q.name}` | $oracle | ${q.doc} |"
    }
    // '#' margin: the markdown table's own '|' would be eaten by the
    // default stripMargin character; the title line carries a doubled
    // '#' because stripMargin consumes the first one
    val md =
      s"""## Query catalog
         #
         #Generated from `QueryRegistry` by `graft.Docs` — ${rows.size}
         #registered queries (${QueryRegistry.all.count(_.oracle.isDefined)}
         #oracle-checked, ${QueryRegistry.all.count(_.oracle.isEmpty)}
         #rows-only ML). Regenerate with `sbt "runMain graft.Docs"`.
         #
         #| query | check | design note |
         #|---|---|---|
         #${rows.mkString("\n")}
         #""".stripMargin('#')
    Files.writeString(Paths.get(out), md)
    println(s"[docs] wrote ${rows.size} queries to $out")
  }
}
