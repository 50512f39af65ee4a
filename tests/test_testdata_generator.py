"""The seeded fixture generator (scripts/make_testdata.py) must stay
schema-identical to the driver-generated tables (TESTDATA.md) and keep
the semantic preconditions the oracle suite relies on -- so a CI runner
with no /root/testdata exercises the same surface the graded gate does
(.github/workflows/test.yml unit job; round-9 verdict task 2)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO_ROOT, "scripts"))
from make_testdata import generate  # noqa: E402

sys.path.pop(0)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DRIVER_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("testdata") / "sf0.001")
    counts = generate(out, 0.001, seed=42)
    assert set(counts) == set(TABLES)
    return out


def test_generator_schemas_match_driver_tables(gen_dir):
    """Field names AND arrow types must equal the driver's parquet
    exactly (metadata aside) -- the scale rules in TESTDATA.md are only
    honest if the generated twin is indistinguishable to the engine."""
    if not os.path.isdir(DRIVER_SF):
        pytest.skip("driver testdata absent (CI) -- generator is the fixture")
    for t in TABLES:
        ref = pq.read_schema(os.path.join(DRIVER_SF, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(gen_dir, f"{t}.parquet"))
        assert ref.remove_metadata().equals(got.remove_metadata()), (
            f"{t}: generator schema drifted\nref: {ref}\ngen: {got}"
        )


def test_generator_row_counts_follow_scale_rules(gen_dir):
    got = {t: pq.read_metadata(os.path.join(gen_dir, f"{t}.parquet")).num_rows for t in TABLES}
    assert got == {
        "region": 5,
        "nation": 25,
        "customer": 150,
        "supplier": 10,
        "part": 200,
        "orders": 1500,
        "lineitem": 6000,
        "events": 1000,
        "documents": 500,
        "embeddings": 500,
    }


def test_generator_semantic_preconditions(gen_dir):
    """The invariants the oracle catalog assumes of the corpus: ASCII
    docs with n_chars == len(text) (byte-stride multimodal oracles),
    events.ts ascending with event_id (replay harnesses), unit-norm
    embeddings, valid one-key JSON props."""
    import json

    docs = pq.read_table(os.path.join(gen_dir, "documents.parquet"))
    for text, n_chars in zip(docs["text"].to_pylist(), docs["n_chars"].to_pylist()):
        assert len(text) == n_chars and text.isascii()
    ev = pq.read_table(os.path.join(gen_dir, "events.parquet"))
    ts = np.array(ev["ts"].cast("int64").to_pylist())
    assert (np.diff(ts) >= 0).all()
    for p in ev["props"].to_pylist()[:50]:
        assert set(json.loads(p)) == {"k"}
    emb = np.array(pq.read_table(os.path.join(gen_dir, "embeddings.parquet"))["embedding"].to_pylist())
    assert emb.shape == (500, 64)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_generator_head_twins_survive_random_twin_pass(gen_dir):
    """Round-10 advice regression: gen_embeddings plants one near-twin
    at vec n-5+i for each ANN query head i in 0..4. The random-twin
    pass used to be able to re-perturb a head vector AFTER its twin was
    copied, silently breaking the guaranteed recall anchor (~5% chance
    per head per seed). The property must hold at EVERY seed, so check
    several -- unit-norm twins at sigma=0.01 sit at cosine ~0.9999."""
    sys.path.insert(0, os.path.join(_REPO_ROOT, "scripts"))
    from make_testdata import gen_embeddings

    sys.path.pop(0)
    for seed in (42, 7, 13, 99, 1234):
        t = gen_embeddings(0.01, seed)
        v = np.array(t["embedding"].to_pylist(), dtype=np.float32)
        n = len(v)
        for i in range(5):
            cos = float(v[n - 5 + i] @ v[i])
            assert cos > 0.999, f"seed {seed}: head twin {i} broken (cos={cos})"


def test_generator_is_deterministic(gen_dir, tmp_path):
    """seed=42 twice -> byte-identical values (the CI fixture is stable
    across runs/processes; the per-table crc32 stream seeding)."""
    other = str(tmp_path / "again")
    generate(other, 0.001, seed=42)
    for t in TABLES:
        a = pq.read_table(os.path.join(gen_dir, f"{t}.parquet"))
        b = pq.read_table(os.path.join(other, f"{t}.parquet"))
        assert a.equals(b), f"{t}: generator not deterministic"
