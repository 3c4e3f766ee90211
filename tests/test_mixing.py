"""Deterministic dataloader ops: epoch_shuffle (training-order shuffle +
sharding) and upsample_repeat (repeat-factor domain mixing)."""

import hashlib

import pytest

from clinvar_ingest_spark.operators.curation import (
    epoch_shuffle,
    upsample_repeat,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, "wiki" if i % 3 == 0 else "cc") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_epoch_shuffle_matches_python_twin(spark, docs):
    got = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in epoch_shuffle(docs, 4, seed="epoch0").collect()
    }
    keys = {i: _md5(f"epoch0:{i}") for i in range(60)}
    shard = {i: int(k[:8], 16) % 4 for i, k in keys.items()}
    want = {}
    for s in range(4):
        ids = sorted(
            (i for i in range(60) if shard[i] == s),
            key=lambda i: (keys[i], i),
        )
        for pos, i in enumerate(ids, 1):
            want[i] = (s, pos)
    assert got == want


def test_epoch_shuffle_seed_and_invariance(spark, docs):
    a = epoch_shuffle(docs.repartition(1), 4).collect()
    b = epoch_shuffle(docs.repartition(7), 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    e0 = {r["doc_id"]: r["pos"] for r in a}
    e1 = {
        r["doc_id"]: r["pos"]
        for r in epoch_shuffle(docs, 4, seed="epoch1").collect()
    }
    assert e0 != e1  # a new seed is a new permutation
    with pytest.raises(ValueError):
        epoch_shuffle(docs, 0)


def test_upsample_repeat_exact_counts(spark, docs):
    # wiki 5/2 epochs (2 copies + half the docs get a 3rd), cc 1/1
    out = upsample_repeat(docs, {"wiki": (5, 2)}).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["copy"])
    for i in range(60):
        copies = sorted(per_doc[i])
        if i % 3 == 0:
            extra = int(_md5(f"up:{i}")[:8], 16) % 2 < 1
            assert copies == list(range(2 + extra))
        else:
            assert copies == [0]  # unlisted domain: one epoch
    n_wiki = sum(len(c) for d, c in per_doc.items() if d % 3 == 0)
    n_docs_wiki = sum(1 for d in per_doc if d % 3 == 0)
    # mass within one doc of 2.5 epochs
    assert abs(n_wiki - 2.5 * n_docs_wiki) <= n_docs_wiki / 2


def test_upsample_repeat_zero_weight_drops(spark, docs):
    out = upsample_repeat(docs, {"wiki": (0, 1), "cc": (2, 1)}).collect()
    assert all(r["domain"] == "cc" for r in out)
    assert {r["copy"] for r in out} == {0, 1}
    with pytest.raises(ValueError):
        upsample_repeat(docs, {"wiki": (1, 0)})
