"""S6 artifact manager: the reference ModelManager contract (passthrough /
cache-hit / unknown-name / verify-with-tolerance / atomic publish) plus
Spark executor distribution via addFile + SparkFiles."""

import pytest

from pdf_watermark_removal_otsu_inpaint_spark.sources.artifacts import (
    ArtifactManager, ArtifactSpec)


def fake_fetcher(payload: bytes):
    def fetch(url, dest):
        with open(dest, "wb") as f:
            f.write(payload)
    return fetch


def mgr(tmp_path, payload=b"x" * 1000, size=1000):
    reg = {"m.bin": ArtifactSpec(url="memory://m", size=size, description="t")}
    return ArtifactManager(reg, cache_dir=tmp_path / "cache",
                           fetcher=fake_fetcher(payload))


def test_fetch_verify_cache_roundtrip(tmp_path):
    m = mgr(tmp_path)
    p = m.get_path("m.bin")
    assert p.read_bytes() == b"x" * 1000
    # second call is a cache hit: poison the fetcher to prove no refetch
    m.fetcher = None
    assert m.get_path("m.bin") == p
    assert m.status()["m.bin"]["cached"]
    m.clear_cache()
    assert not m.status()["m.bin"]["cached"]


def test_size_tolerance_and_rejection(tmp_path):
    ok = mgr(tmp_path, payload=b"x" * 995, size=1000)   # within 1%
    assert ok.get_path("m.bin").stat().st_size == 995
    bad = mgr(tmp_path / "b", payload=b"x" * 900, size=1000)  # 10% off
    with pytest.raises(RuntimeError, match="verification failed"):
        bad.get_path("m.bin")
    assert not (bad.cache_dir / "m.bin").exists()       # no partial publish
    assert not list(bad.cache_dir.glob("*.tmp"))        # tmp cleaned up


def test_unknown_name_and_custom_path(tmp_path):
    m = mgr(tmp_path)
    with pytest.raises(ValueError, match="Unknown artifact"):
        m.get_path("nope.bin")
    custom = tmp_path / "custom.bin"
    custom.write_bytes(b"y")
    assert m.get_path(str(custom)) == custom            # passthrough


def test_distribute_reaches_executors(spark, tmp_path):
    """The artifact lands on every task's SparkFiles root with the right
    bytes — the per-cluster (not per-task) fetch pattern for UDF stages."""
    m = mgr(tmp_path, payload=b"weights!" * 16, size=128)
    basename = m.distribute(spark, "m.bin")

    def read_len(it):
        from pyspark import SparkFiles
        with open(SparkFiles.get(basename), "rb") as f:
            data = f.read()
        for pdf in it:
            pdf["n"] = len(data)
            yield pdf

    got = (spark.range(8).repartition(4)
           .mapInPandas(read_len, "id long, n int").collect())
    assert {r.n for r in got} == {128}


def test_path_traversal_names_rejected(tmp_path):
    """Registry/artifact names with separators or '..' must be rejected
    before any path is built (cache-hit lookup would otherwise resolve
    outside the cache dir)."""
    from pdf_watermark_removal_otsu_inpaint_spark.sources.artifacts import (
        ArtifactManager)
    mgr = ArtifactManager(registry={}, cache_dir=tmp_path)
    import pytest
    for bad in ("../evil", "a/b", "x/../y", "..", ""):
        with pytest.raises(ValueError, match="Invalid artifact name"):
            mgr.get_path(bad)
    # dots INSIDE a plain filename are legal (reaches the registry check)
    with pytest.raises(ValueError, match="Unknown artifact"):
        mgr.get_path("weights..v2.bin")
