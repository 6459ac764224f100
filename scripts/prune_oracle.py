#!/usr/bin/env python3
"""Prune <outDir>/oracle_sql.json to only the gates that have output dirs
(for targeted GRAFT_VERIFY_ONLY runs checked with oracle_check.py)."""
import json, os, sys
d = sys.argv[1]
o = json.load(open(f"{d}/oracle_sql.json"))
keep = {k: v for k, v in o.items() if os.path.isdir(f"{d}/{k}")}
json.dump(keep, open(f"{d}/oracle_sql.json", "w"))
print(f"kept {len(keep)}/{len(o)} oracle entries")
