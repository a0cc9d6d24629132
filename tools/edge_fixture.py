#!/usr/bin/env python3
"""Build the adversarial edge fixture: a copy of a base sf dir with
degenerate rows appended — the document/embedding shapes a real crawl
contains but the generated gate fixtures never do.

    python3 tools/edge_fixture.py /root/testdata/sf0.001 /tmp/sfedge
    sbt -batch "runMain graft.Verify /tmp/sfedge /tmp/verify_sfedge"
    python3 tools/check.py /tmp/sfedge /tmp/verify_sfedge

Expected: every oracle-checked query green EXCEPT q_sample_priority,
which fails LOUDLY by design (doc 90001's weight n_chars=0 — priority
sampling validates w > 0 rather than silently biasing the estimator).
The two sf0.01-pinned oracles self-skip.

This sweep found (and the repo then fixed): DuckDB array_to_string([])
= NULL vs Spark array_join = '' in the decontaminate oracle + every
fixture-twin CTE; simhash/tokenCount NULL-propagation that the oracles
coalesced; NaN cosine from zero-norm embeddings out-ranking every real
neighbor in Spark desc sorts; a digest NPE on NULL media. EdgeDocsSpec
pins the resulting conventions in-repo.
"""
import shutil, sys

import numpy as np
import pandas as pd


def main(base: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(base, out)

    d = pd.read_parquet(f"{out}/documents.parquet")
    dup = d.iloc[7]
    rows = [
        (90001, None, "en", "srcE"),                 # NULL text
        (90002, "", "en", "srcE"),                   # empty text
        (90003, "   ", "en", "srcE"),                # whitespace only
        (90004, dup.text, dup.lang, dup.source),     # exact duplicate
        (90005, "汉字 répété émojis 🚀 test ünïcode grüße 北京 "
                "something else entirely here", "zh", "srcE"),
        (90006, " ".join(["spam"] * 200), "en", "srcE"),  # repetition
        (90007, "x" * 5000, "en", "srcE"),           # one giant token
        (90008, "\n\n\n", "en", "srcE"),             # newlines only
    ]
    add = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    add["n_chars"] = add.text.map(lambda t: 0 if t is None else len(t)).astype("int64")
    add["doc_id"] = add.doc_id.astype("int64")
    pd.concat([d, add[d.columns]], ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False)

    e = pd.read_parquet(f"{out}/embeddings.parquet")
    dim = len(e.embedding.iloc[0])
    zero = pd.DataFrame({
        "vec_id": np.array([90001], dtype="int64"),
        "embedding": [np.zeros(dim, dtype=np.float32)],
        "label": np.array([0], dtype="int32"),
    })
    pd.concat([e, zero[e.columns]], ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False)
    print(f"edge fixture at {out}: {len(d) + len(add)} documents, "
          f"{len(e) + 1} embeddings")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
