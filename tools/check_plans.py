#!/usr/bin/env python3
"""Diff two plan-fingerprint artifacts (graft.tools.PlanFingerprints).

Usage: check_plans.py OLD.json NEW.json [--allow q1,q2,...]

Exit 0 iff every query present in both artifacts has an identical
fingerprint, except queries named in --allow (shape changes explained in
the round notes). Added/removed queries are reported but never fail the
gate (the registry legitimately grows).
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    allow = set()
    if len(sys.argv) > 4 and sys.argv[3] == "--allow":
        allow = set(sys.argv[4].split(","))
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = sorted(q for q in set(old) & set(new)
                     if old[q]["fp"] != new[q]["fp"])
    for q in added:
        print(f"ADDED    {q}")
    for q in removed:
        print(f"REMOVED  {q}")
    bad = []
    for q in changed:
        tag = "ALLOWED " if q in allow else "CHANGED "
        print(f"{tag} {q}")
        print(f"  old: {old[q]['tree'][:200]}")
        print(f"  new: {new[q]['tree'][:200]}")
        if q not in allow:
            bad.append(q)
    print(f"\n{len(changed)} changed ({len(bad)} unexplained), "
          f"{len(added)} added, {len(removed)} removed")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
