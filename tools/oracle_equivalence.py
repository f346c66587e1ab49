#!/usr/bin/env python3
"""Dev-only equivalence pin for rewritten oracle forms (round-14 d06/d11
shingle-keyed candidate rewrite): runs TWO DuckDB SQL files over the same
sf dir and asserts bit-identical output, so a future edit to the live
oracle can't silently diverge from the proven all-pairs form. Invoked by
graft.queries.OracleEquivalenceSpec with the LIVE SQL pulled from
SparkEntry.oracleSql; NOT part of the engine.

Usage: oracle_equivalence.py <sf_dir> <sql_a_file> <sql_b_file>
Exit 0 = identical; nonzero = divergence (first differing row printed)."""
import math
import os
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cells_differ(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return False
        return struct.pack("<d", a) != struct.pack("<d", b)
    return a != b


def main(sf_dir, sql_a, sql_b):
    con = duckdb.connect()
    text_a, text_b = open(sql_a).read(), open(sql_b).read()
    # bind views LAZILY — only tables a query actually references (round-15
    # ADVICE: unconditional all-table binding made a present-but-incomplete
    # sf dir fail at view creation, masquerading as oracle divergence)
    import re
    referenced = [t for t in TABLES
                  if re.search(rf"\b{t}\b", text_a) or re.search(rf"\b{t}\b", text_b)]
    for t in referenced:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            # don't fail eagerly: the regex may have matched a table word
            # inside a string literal/comment. If the query REALLY needs
            # the table, the CatalogException path below reports exit 2.
            print(f"note: {p} absent; view '{t}' not bound")
            continue
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # The word-boundary regex pre-scan can miss a quoted/differently-cased
    # table reference (view never bound) or misfire on a table word inside
    # a string literal (round-16 ADVICE). A CatalogException for a missing
    # view therefore reports MISSING INPUT / exit 2 — an execution-setup
    # problem — never a divergence.
    try:
        ra = con.execute(text_a).fetchall()
        rb = con.execute(text_b).fetchall()
    except duckdb.CatalogException as e:
        print(f"MISSING INPUT: DuckDB catalog error ({e}) — "
              f"table not bound by the regex pre-scan, not a divergence")
        return 2
    if len(ra) != len(rb):
        print(f"DIVERGED: {len(ra)} rows vs {len(rb)} rows")
        return 1
    for i, (x, y) in enumerate(zip(ra, rb)):
        if len(x) != len(y) or any(cells_differ(a, b) for a, b in zip(x, y)):
            print(f"DIVERGED at row {i}: {x} vs {y}")
            return 1
    print(f"identical: {len(ra)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
