"""S6: model/artifact fetch, cache, verify, and cluster distribution.

Re-expresses the reference's ModelManager (model_manager.py:33-209) for a
Spark deployment: the same contract — custom absolute paths pass through
(:62-67), cache hits short-circuit (:69-74), unknown names raise (:76-81),
downloads land in an atomic tmp-then-rename (:111-132) and are size-verified
with a 1% tolerance (:140-168) — plus the piece a cluster needs that a CLI
doesn't: `distribute()` ships the verified artifact to every executor via
SparkContext.addFile, so Pandas-UDF stages resolve it with SparkFiles.get
instead of each worker re-downloading.

Network access is injected (`fetcher`): production passes an HTTP fetcher;
tests and offline environments pass a deterministic generator. The registry
is caller-supplied — this engine's default pipeline needs no model weights
(SURVEY §2.1: the S6 consumer is the out-of-scope YOLO path; U3's mask
union is the Spark-side piece), so no artifact URLs are baked in."""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass
from pathlib import Path


@dataclass(frozen=True)
class ArtifactSpec:
    """One registry entry: where an artifact lives and how big it must be."""
    url: str
    size: int                    # expected bytes; 0 = skip the size check
    description: str = ""


DEFAULT_CACHE_DIR = Path.home() / ".cache" / "pdf_wm_token_engine" / "artifacts"
SIZE_TOLERANCE = 0.01            # accept within 1% (model_manager.py:160-166)


def http_fetcher(url: str, dest: Path) -> None:
    """Stream `url` to `dest` (stdlib only; no extra dependencies)."""
    import urllib.request
    with urllib.request.urlopen(url, timeout=300) as r, open(dest, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 16)


class ArtifactManager:
    """Fetch-once, verify, cache, and distribute binary artifacts."""

    def __init__(self, registry: dict[str, ArtifactSpec] | None = None,
                 cache_dir: str | os.PathLike | None = None,
                 fetcher=http_fetcher):
        self.registry = dict(registry or {})
        self.cache_dir = Path(cache_dir or DEFAULT_CACHE_DIR)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.fetcher = fetcher

    # -- the reference's get_model_path contract (model_manager.py:48-83) --
    def get_path(self, name: str) -> Path:
        p = Path(name)
        if p.is_absolute() and p.exists():     # custom artifact passthrough
            return p
        # registry names are plain filenames: a separator or the '..'
        # component would resolve cache lookups outside cache_dir and break
        # mkstemp's prefix. Path(name).name != name catches exactly the
        # path-escaping forms while allowing dots INSIDE a filename
        # (e.g. 'weights..v2.bin' is a legal plain name).
        if not name or Path(name).name != name or name == "..":
            raise ValueError(
                f"Invalid artifact name {name!r}: path separators and '..' "
                "are not allowed (absolute paths to existing files are the "
                "passthrough form)")
        cached = self.cache_dir / name
        if cached.exists():                    # cache hit short-circuits
            return cached
        if name not in self.registry:
            raise ValueError(
                f"Unknown artifact: {name}. Available: "
                f"{', '.join(sorted(self.registry)) or '(empty registry)'}")
        return self._fetch(name, cached)

    def _fetch(self, name: str, target: Path) -> Path:
        spec = self.registry[name]
        fd, tmp_name = tempfile.mkstemp(dir=self.cache_dir,
                                        suffix=".tmp", prefix=name + ".")
        os.close(fd)                           # fetcher reopens for writing
        tmp = Path(tmp_name)
        try:
            self.fetcher(spec.url, tmp)
            if not self._verify(tmp, spec):
                raise RuntimeError(
                    f"Artifact verification failed for {name}: size "
                    f"{tmp.stat().st_size if tmp.exists() else 'missing'} "
                    f"vs expected {spec.size} (>1% off)")
            tmp.rename(target)                 # atomic publish
        finally:
            if tmp.exists():
                tmp.unlink()
        return target

    def _verify(self, path: Path, spec: ArtifactSpec) -> bool:
        if not path.exists():
            return False
        if not spec.size:
            return True
        actual = path.stat().st_size
        return abs(actual - spec.size) <= spec.size * SIZE_TOLERANCE

    # -- cluster distribution (the Spark-side addition) ---------------------
    def distribute(self, spark, name: str) -> str:
        """Verify/cache locally, then ship to every executor. Returns the
        basename for workers to resolve via
        `pyspark.SparkFiles.get(basename)` — one fetch per cluster, not one
        per task, and the file survives executor restarts (Spark re-ships
        from the driver)."""
        local = self.get_path(name)
        spark.sparkContext.addFile(str(local))
        return local.name

    # -- maintenance (model_manager.py:171-209) ------------------------------
    def status(self) -> dict[str, dict]:
        out = {}
        for name, spec in sorted(self.registry.items()):
            cached = self.cache_dir / name
            out[name] = {"cached": cached.exists(),
                         "size": (cached.stat().st_size if cached.exists()
                                  else spec.size),
                         "description": spec.description}
        return out

    def clear_cache(self) -> None:
        if self.cache_dir.exists():
            shutil.rmtree(self.cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
