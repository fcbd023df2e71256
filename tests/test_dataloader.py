"""Native C++ data loader tests (builds the .so on first run)."""

import gzip
import os

import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.data import TextSampler


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    data = np.random.default_rng(0).integers(0, 256, 500_000).astype(np.uint8)
    raw = d / "c.raw"
    raw.write_bytes(data.tobytes())
    gz = d / "c.gz"
    with gzip.open(gz, "wb") as f:
        f.write(data.tobytes())
    return str(raw), str(gz), data


def test_native_loader_raw_and_gzip(corpus):
    raw, gz, data = corpus
    for path in (raw, gz):
        ts = TextSampler(path, seed=7)
        assert ts._c.size == len(data)
        b = ts.sample("train", 8, 64)
        assert b.shape == (8, 65) and b.dtype == np.int32
        blob = data.tobytes()
        for row in b:
            assert row.astype(np.uint8).tobytes() in blob


def test_split_ranges(corpus):
    raw, _, data = corpus
    ts = TextSampler(raw, train_frac=0.5, seed=1)
    head, tail = data[:len(data) // 2].tobytes(), data[len(data) // 2:].tobytes()
    for row in ts.sample("train", 8, 32):
        assert row.astype(np.uint8).tobytes() in head
    for row in ts.sample("valid", 8, 32):
        assert row.astype(np.uint8).tobytes() in tail


def test_stream_prefetch(corpus):
    raw, _, _ = corpus
    ts = TextSampler(raw, seed=2)
    g = ts.stream("train", 2, 16)
    a, b = next(g), next(g)
    assert a.shape == (2, 17)
    assert not np.array_equal(a, b)


def test_python_fallback_array():
    data = np.arange(10_000, dtype=np.uint8)
    ts = TextSampler(data, seed=3)
    assert ts.backend == "python"
    b = ts.sample("train", 4, 16)
    # crops of an arange are consecutive ints (mod 256)
    assert ((np.diff(b, axis=1) % 256) == 1).all()
