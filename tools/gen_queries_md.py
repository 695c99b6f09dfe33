#!/usr/bin/env python3
"""Regenerate QUERIES.md — the browsable index of SparkEntry.queries
(name, first comment sentence, check type). Dev tool; run after adding
queries."""
import re
src = open('src/main/scala/graft/SparkEntry.scala').read()
lines = src.split('\n')
entries, comment, in_queries = [], [], False
for ln in lines:
    if 'def queries: Map[' in ln: in_queries = True; continue
    if 'def oracleSql' in ln: in_queries = False
    if not in_queries: continue
    m = re.match(r'    "([a-z0-9_]+)" -> ', ln)
    if m:
        txt = ' '.join(c.strip().lstrip('/').strip() for c in comment
                       if c.strip().startswith('//'))
        txt = re.sub(r'\s+', ' ', txt).strip()
        first = txt.split(' — ')[0].split('. ')[0][:110] if txt else ''
        entries.append((m.group(1), first))
        comment = []
    elif ln.strip().startswith('//'):
        comment.append(ln)
omap = set(re.findall(r'^    "([a-z0-9_]+)" ->',
                      src.split('def oracleSql')[1], re.M))
noor = set(re.findall(r'^    "([a-z0-9_]+)" ->',
                      src.split('def noOracleReason')[1], re.M))
seen, rows = set(), []
for name, desc in entries:
    if name in seen: continue
    seen.add(name)
    check = ('oracle' if name in omap else
             'rows-only (reasoned)' if name in noor else 'MISSING')
    rows.append((name, desc, check))
assert not [r for r in rows if r[2] == 'MISSING'], 'uncovered query!'
out = ['# QUERIES — generated index of the driver-contract battery', '',
       f'{len(rows)} queries in `SparkEntry.queries`. "oracle" = DuckDB SQL twin,',
       'hash-compared by the driver; "rows-only" = documented in',
       '`SparkEntry.noOracleReason` with ScalaTest evidence. Regenerate with',
       '`python3 tools/gen_queries_md.py` after adding queries.', '',
       '| Query | What it computes | Check |', '|---|---|---|']
for name, desc, check in sorted(rows):
    out.append(f'| `{name}` | {desc.replace("|", chr(92)+"|")} | {check} |')
open('QUERIES.md', 'w').write('\n'.join(out) + '\n')
print('QUERIES.md:', len(rows), 'queries')
