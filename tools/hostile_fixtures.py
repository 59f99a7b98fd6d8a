#!/usr/bin/env python3
"""Hostile DOCS / VECTORS fixture generator (r14 verdict #4/#5).

Builds two fixture dirs that clone a base scale-factor dir but replace ONE
table with a poisoned variant, so every d_*/t_* (docs) and sim_*/d_*embedding
(vectors) query can be run through BOTH engines (graft.Verify + DuckDB via
tools/oracle_check.py) over inputs a 100 TB crawl actually contains:

  hostile_docs/documents.parquet  — 0-length doc, null text, whitespace-only
    text, embedded NULs, astral-plane + zero-width + BiDi chars, a multi-MB
    doc, duplicate doc_ids (same AND different text), null lang/source, a
    lying n_chars, an exact content dup of doc 0
  hostile_vecs/embeddings.parquet — zero-norm vector, NaN / +Inf / -Inf
    components, wrong-dim strays (short and long), null embedding, empty
    array, duplicate vec_ids (same AND different vector), null label

Usage: python3 tools/hostile_fixtures.py <base_sf_dir> <out_root>
Then:  sbt "runMain graft.Verify <out_root>/hostile_docs /tmp/hd_out <names>"
       python3 tools/oracle_check.py <out_root>/hostile_docs /tmp/hd_out <names>
"""
import os
import random
import shutil
import sys

import duckdb


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def clone_base(base, out, skip):
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = f"{base}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == skip or not os.path.exists(src):
            continue
        if os.path.exists(dst):
            os.remove(dst)
        shutil.copyfile(src, dst)


def hostile_docs(base, out):
    clone_base(base, out, "documents")
    con = duckdb.connect()
    rng = random.Random(1234)
    # 60k words (~350 KB): ~500x the fixture's doc length — enough to catch
    # O(words x chunks)-class operator quadratics as multi-second slowdowns —
    # while the DuckDB oracle replays (list comprehensions that slice the
    # token list per window) stay tractable; at the original 400k words the
    # SQL side burned 45+ CPU-minutes on one query. The 400k-word variant
    # remains worth running Spark-only when touching the chunking family
    # (it is what caught the dedupChunks re-split as a 20-min hang).
    big = " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "epsi",
                               "zeta", "eta", "theta"]) for _ in range(60_000))
    orig = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM "
        f"'{base}/documents.parquet' ORDER BY doc_id").fetchall()
    doc0_text = orig[0][1]
    doc42 = next(r for r in orig if r[0] == 42)
    astral = ("naïve \U0001F600\U0001D518 z​e​ro wid﻿th "
              "‍ join ‮RTL‬ mark")
    rows = list(orig) + [
        (9000, "", "en", "src_h", 0),                       # 0-length
        (9001, None, "en", "src_h", None),                  # null text
        (9002, "   \t\n  ", "en", "src_h", 7),              # whitespace-only
        (9003, "abc\x00def ghi\x00jkl nul bytes", "en", "src_h", 26),
        (9004, astral, "zz", "src_h", len(astral)),         # astral/zero-width
        (9005, big, "en", "src_big", len(big)),             # multi-MB doc
        (42, doc42[1], doc42[2], doc42[3], doc42[4]),       # dup id, same text
        (43, "a wholly different text for the colliding id",
         "en", "src_h", 44),                                # dup id, diff text
        (9006, "null metadata text body here", None, None, 28),
        (9007, "short body", "en", "src_h", 999_999),       # lying n_chars
        (9008, doc0_text, "es", "src_h", len(doc0_text)),   # content dup of 0
    ]
    con.execute("""CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,
                   source VARCHAR, n_chars BIGINT)""")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT parquet)")
    print(f"hostile_docs: {len(rows)} rows -> {out}/documents.parquet")


def hostile_vecs(base, out):
    clone_base(base, out, "embeddings")
    con = duckdb.connect()
    orig = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"'{base}/embeddings.parquet' ORDER BY vec_id").fetchall()
    dim = len(orig[0][1])
    vec7 = orig[7][1]
    # irregular components: a 0.1-step grid made centroid sums land exactly
    # on 6-dp half boundaries, where Spark's BigDecimal HALF_UP and DuckDB's
    # float-multiply round() legitimately differ by 1 ppm — that is inherent
    # cross-engine noise at measure-zero inputs, not a robustness class;
    # the planted vector's job is dims/finiteness/duplicates
    base_v = [0.0137 * ((i * 7) % 13) - 0.05 * ((i * 3) % 5) + 0.2113
              for i in range(dim)]
    nanv = list(base_v); nanv[3] = float("nan")
    pinf = list(base_v); pinf[0] = float("inf")
    ninf = list(base_v); ninf[dim - 1] = float("-inf")
    rows = list(orig) + [
        (9000, [0.0] * dim, 0),            # zero-norm
        (9001, nanv, 1),                   # NaN component
        (9002, pinf, 2),                   # +Inf component
        (9003, ninf, 0),                   # -Inf component
        (9004, [1.0, 2.0], 1),             # wrong dim: short
        (9005, [0.5] * (dim + 16), 2),     # wrong dim: long
        (9006, None, 0),                   # null embedding
        (9007, [], 1),                     # empty array
        (7, vec7, orig[7][2]),             # dup vec_id, same vector
        (8, [9.9] * dim, 2),               # dup vec_id, different vector
        (9008, base_v, None),              # null label
    ]
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT parquet)")
    print(f"hostile_vecs: {len(rows)} rows -> {out}/embeddings.parquet")


if __name__ == "__main__":
    base, out_root = sys.argv[1], sys.argv[2]
    hostile_docs(base, f"{out_root}/hostile_docs")
    hostile_vecs(base, f"{out_root}/hostile_vecs")
