"""Engine parameter model.

Mirrors the reference's tunable surface (defaults cited into
/root/reference/src/pdf_watermark_removal/):

- ``color_tolerance`` 30  — watermark_detector.py:20,141
- ``kernel_size``     3   — watermark_detector.py:14,55
- ``protect_text``    True — watermark_detector.py:19
- ``inpaint_radius``  2   — watermark_remover.py:15,73
- ``inpaint_strength`` 1.0 — watermark_remover.py:16,74
- run-length bounds 100..5000 — watermark_detector.py:755 (min_area/max_area)
- multi-pass count per doc profile — document_classifier.py:180-229

Profiles reproduce ``get_optimal_parameters`` (document_classifier.py:180-229)
translated to the 1-D token domain (dpi dropped: no raster here).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class EngineParams:
    color_tolerance: int = 30
    kernel_size: int = 3
    protect_text: bool = True
    inpaint_radius: int = 2
    inpaint_strength: float = 1.0
    passes: int = 1
    min_run: int = 100
    max_run: int = 5000
    text_expand: int = 3  # watermark_detector.py:193 expand_pixels default

    def with_(self, **kw) -> "EngineParams":
        return replace(self, **kw)


# document_classifier.py:203-229 — per-document-class parameter sets.
PROFILE_PARAMS: dict[str, EngineParams] = {
    "electronic": EngineParams(color_tolerance=18, inpaint_strength=1.0,
                               kernel_size=3, protect_text=True, passes=1),
    "scanned": EngineParams(color_tolerance=32, inpaint_strength=1.3,
                            kernel_size=5, protect_text=True, passes=2),
    "mixed": EngineParams(color_tolerance=25, inpaint_strength=1.1,
                          kernel_size=3, protect_text=True, passes=2),
    # document_classifier.py:192-201 electronic-color preset
    "electronic-color": EngineParams(color_tolerance=15, inpaint_strength=1.0,
                                     kernel_size=2, protect_text=True, passes=1),
}

DEFAULT_PARAMS = EngineParams()
