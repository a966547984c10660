#!/usr/bin/env python3
"""Planted-regression self-test for plan_shape_diff.py (VERDICT r19 #2:
the gate is only trustworthy if a doctored stamp demonstrably fails
it). Runs the diff as a subprocess on synthetic stamps and asserts the
exit code + verdict line for every class the gate must catch:

  flipped has_broadcast (lost broadcast)  -> exit 1, CHANGED
  n_exchanges bump (new shuffle)          -> exit 1, CHANGED
  wholestage false (codegen fallout)      -> exit 1, CHANGED
  removed query (probe-clobbered stamp)   -> exit 1, REMOVED
  added query (registry growth)           -> exit 0, ADDED
  identical stamps                        -> exit 0
  malformed input / bad usage             -> exit 2

Run: python3 scripts/test_plan_shape_diff.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

DIFF = os.path.join(os.path.dirname(__file__), "plan_shape_diff.py")

BASE = {
    "q01_trim_semijoin": {"n_exchanges": 3, "has_broadcast": True,
                          "wholestage": True},
    "q30_dedup_exact": {"n_exchanges": 2, "has_broadcast": False,
                        "wholestage": True},
}


def run(old, new_literal=None, new_obj=None, argv=None):
    with tempfile.TemporaryDirectory() as tmp:
        def dump(name, obj, literal=None):
            p = os.path.join(tmp, name)
            with open(p, "w") as f:
                f.write(literal if literal is not None else json.dumps(obj))
            return p
        if argv is None:
            argv = [dump("old.json", old),
                    dump("new.json", new_obj, new_literal)]
        r = subprocess.run([sys.executable, DIFF] + argv,
                           capture_output=True, text=True)
        return r.returncode, r.stdout, r.stderr


def clone(**edits):
    new = json.loads(json.dumps(BASE))
    for q, fields in edits.items():
        new.setdefault(q, {}).update(fields)
    return new


failures = []


def check(label, got, want_code, want_sub, text):
    if got != want_code or want_sub not in text:
        failures.append(f"{label}: exit={got} (want {want_code}), "
                        f"output={text!r}")


# identical -> OK
code, out, _ = run(BASE, new_obj=BASE)
check("identical", code, 0, "OK:", out)

# lost broadcast -> CHANGED, exit 1
code, out, _ = run(BASE, new_obj=clone(
    q01_trim_semijoin={"has_broadcast": False}))
check("lost-broadcast", code, 1, "CHANGED q01_trim_semijoin", out)
check("lost-broadcast-field", code, 1, "has_broadcast: True -> False", out)

# new shuffle -> CHANGED, exit 1
code, out, _ = run(BASE, new_obj=clone(q30_dedup_exact={"n_exchanges": 3}))
check("new-shuffle", code, 1, "CHANGED q30_dedup_exact", out)

# codegen fallout -> CHANGED, exit 1
code, out, _ = run(BASE, new_obj=clone(q30_dedup_exact={"wholestage": False}))
check("codegen-fallout", code, 1, "CHANGED q30_dedup_exact", out)

# removed query (probe-clobbered / failed stamp) -> exit 1
shrunk = {k: v for k, v in BASE.items() if k != "q30_dedup_exact"}
code, out, _ = run(BASE, new_obj=shrunk)
check("removed", code, 1, "REMOVED q30_dedup_exact", out)

# added query (registry growth) -> exit 0
code, out, _ = run(BASE, new_obj=clone(
    q99_para_dedup={"n_exchanges": 3, "has_broadcast": False,
                    "wholestage": True}))
check("added", code, 0, "ADDED", out)

# malformed: list instead of object -> exit 2
code, _, err = run(BASE, new_literal="[1, 2, 3]")
check("malformed-list", code, 2, "not a", err)

# malformed: truncated json -> exit 2
code, _, err = run(BASE, new_literal='{"q01":')
check("malformed-truncated", code, 2, "cannot read", err)

# bad usage: missing argv -> exit 2
code, _, err = run(BASE, argv=[])
check("usage", code, 2, "usage:", err)

if failures:
    print("plan_shape_diff self-test FAILED:", file=sys.stderr)
    for f in failures:
        print(f"  {f}", file=sys.stderr)
    sys.exit(1)
print("plan_shape_diff self-test OK: 9/9 planted cases behave")
