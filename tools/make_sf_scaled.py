"""Derive a larger-SF documents/embeddings dir from a driver-generated
one, deterministically (VERDICT r5 next #7: an sf1 value-exact
spot-check needs sf1-shaped input, and the sandbox only ships
sf{0.001,0.01,0.1}).

Each replica r remaps ids (id + r * base_rows * 10) and appends a
replica token to the text (` rtok<r>`) so replicas are near- but not
exact-duplicates — dedup/pair distributions stay sane instead of every
doc gaining 9 identical twins. Embeddings get one dimension nudged by
r * 1e-3 so vectors stay distinct. Pure pandas/pyarrow (no Spark, no
RNG): the SAME bytes feed both engines, which is all a Spark-vs-DuckDB
value-exact comparison requires.

    python tools/make_sf_scaled.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd


def scale(src: str, dst: str, factor: int) -> None:
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)

    docs = pd.read_parquet(Path(src) / "documents.parquet")
    n = len(docs)
    # replica remap doc_id + r*n*10 assumes every source id < 10*n;
    # assert it so other inputs fail loudly instead of silently
    # colliding replica ids (ADVICE r6)
    if n and int(docs["doc_id"].max()) >= 10 * n:
        raise ValueError(
            f"make_sf_scaled: max(doc_id)={docs['doc_id'].max()} >= "
            f"10*n={10 * n}; replica remap would collide ids")
    reps = []
    for r in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * n * 10
        if r:
            d["text"] = d["text"] + f" rtok{r}"
        reps.append(d)
    pd.concat(reps, ignore_index=True).to_parquet(
        out / "documents.parquet", index=False)

    emb = pd.read_parquet(Path(src) / "embeddings.parquet")
    m = len(emb)
    id_col = "vec_id" if "vec_id" in emb.columns else emb.columns[0]
    if m and int(emb[id_col].max()) >= 10 * m:
        raise ValueError(
            f"make_sf_scaled: max({id_col})={emb[id_col].max()} >= "
            f"10*m={10 * m}; replica remap would collide ids")
    reps = []
    for r in range(factor):
        e = emb.copy()
        e[id_col] = e[id_col] + r * m * 10
        if r:
            e["embedding"] = e["embedding"].map(
                lambda v, _r=r: [float(v[0]) + _r * 1e-3] +
                                [float(x) for x in v[1:]])
        reps.append(e)
    pd.concat(reps, ignore_index=True).to_parquet(
        out / "embeddings.parquet", index=False)
    print(f"wrote {out}: documents={n * factor} embeddings={m * factor}")


if __name__ == "__main__":
    scale(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
          sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1",
          int(sys.argv[3]) if len(sys.argv) > 3 else 10)
