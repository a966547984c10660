#!/usr/bin/env python3
"""Self-test for verify_local's compare internals — run `python3
scripts/test_verify_local.py` after touching row_key / cells_equal /
tolerant_multiset_match. The fallback only fires on rare float-boundary
mismatches, so without this it would never be exercised until the day it
matters."""
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "vl", os.path.join(os.path.dirname(__file__), "verify_local.py")
)
vl = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vl)

cols = ["id", "score"]
floaty = frozenset(["score"])

# two scores equal under the 1e-9 compare tolerance but straddling a
# 7-significant-digit formatting boundary: the sorted-pairwise walk can
# cross-pair such rows (the ADVICE r8 false-FAIL scenario) — the
# tolerant fallback must accept the multiset
a1, a2 = 0.12345644999999, 0.12345645000001
assert vl.cells_equal(a1, a2), "tolerance premise broken"
s_rows = [{"id": "x", "score": a1}, {"id": "x", "score": 0.9}]
o_rows = [{"id": "x", "score": a2}, {"id": "x", "score": 0.9}]
assert vl.row_key(s_rows[0], cols) != vl.row_key(o_rows[0], cols), (
    "boundary premise broken: keys agree, scenario not exercised"
)
assert vl.tolerant_multiset_match(s_rows, o_rows, cols, floaty) is None

# a genuine value difference must survive the fallback (never false PASS)
o_bad = [{"id": "x", "score": 0.5}, {"id": "x", "score": 0.9}]
assert vl.tolerant_multiset_match(s_rows, o_bad, cols, floaty) is not None

# a row present on one side only (non-float key miss) must fail
o_miss = [{"id": "y", "score": a2}, {"id": "x", "score": 0.9}]
assert vl.tolerant_multiset_match(s_rows, o_miss, cols, floaty) is not None

# multiset semantics: duplicates consume candidates one-for-one
s_dup = [{"id": "x", "score": 1.0}, {"id": "x", "score": 1.0}]
o_dup = [{"id": "x", "score": 1.0}, {"id": "x", "score": 2.0}]
assert vl.tolerant_multiset_match(s_dup, o_dup, cols, floaty) is not None

# int-vs-float cross-typing in a masked column still matches by value
s_i = [{"id": "x", "score": 5}]
o_f = [{"id": "x", "score": 5.0}]
assert vl.tolerant_multiset_match(s_i, o_f, cols, floaty) is None

print("verify_local self-test: 6 cases OK")
