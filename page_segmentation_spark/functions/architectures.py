"""Named scorer architectures behind a registry.

The reference ships seven named model architectures behind an enum and
dispatches on the name (reference lib/architecture.py:5-64, consumed by
lib/model.py).  This engine's analog: an architecture is a (window radii,
length cap, weights, bias) bundle — the multi-scale context windows ARE
the conv/pool pyramid of the 1-D model, so varying their radii is the
honest equivalent of varying encoder depth.  Dispatch mirrors the
span-former registry (operators/spans.SPAN_FORMERS): look up by name from
:class:`~page_segmentation_spark.config.ExtractSettings`.

Every architecture is shared by BOTH sides (Spark featurize/score and the
single-node oracle) — the byte-identity invariant is per-architecture.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

from page_segmentation_spark.config import CLS_MAIN
from page_segmentation_spark.functions import scorer_core as sc


@dataclass(frozen=True)
class Arch:
    """One named scorer configuration.  Weights/bias rows follow
    scorer_core.FEATURE_NAMES order; radii drive the window frames in
    functions/features.py and the oracle's _window_sums identically."""

    name: str
    weights: Dict[int, List[float]]
    bias: Dict[int, float]
    local_radius: int = sc.LOCAL_RADIUS
    section_radius: int = sc.SECTION_RADIUS
    directional_radius: int = sc.DIRECTIONAL_RADIUS
    chars_norm_cap: float = sc.CHARS_NORM_CAP


#: the default architecture — exactly the module-level scorer_core
#: constants (arch=None paths and this object are interchangeable).
BASE = Arch(
    name="base",
    weights=sc.WEIGHTS,
    bias=sc.BIAS,
)

#: wider multi-scale context: local ±3, section ±12, directional ±4 —
#: the "deeper encoder" variant (more smoothing, steadier on long
#: documents; slightly slower to react at content/boilerplate borders).
#: Same weight head: the (2r+1) feature normalization keeps the context
#: features on the same scale, so the head transfers.
WIDE_CONTEXT = Arch(
    name="wide_context",
    weights=sc.WEIGHTS,
    bias=sc.BIAS,
    local_radius=3,
    section_radius=12,
    directional_radius=4,
)

#: tighter windows: local ±1, section ±4, directional ±2 — the "shallow
#: encoder": reacts immediately at content/boilerplate borders, best on
#: short chatty pages where ±8 smoothing bleeds across regions.
LOCAL_FINE = Arch(
    name="local_fine",
    weights=sc.WEIGHTS,
    bias=sc.BIAS,
    local_radius=1,
    section_radius=4,
    directional_radius=2,
)

#: precision-oriented head: base windows, but the main-class bias drops
#: from -0.4 to -1.2 — borderline nodes (short paragraphs, captions near
#: link blocks) fall to boilerplate.  For training-data curation where a
#: false-positive boilerplate sentence in the corpus costs more than a
#: dropped caption.  Weight rows are shared; only the bias literal moves,
#: so the byte-identity fold is unchanged in shape.
PRECISION = Arch(
    name="precision",
    weights=sc.WEIGHTS,
    bias={**sc.BIAS, CLS_MAIN: -1.2},
)

ARCHITECTURES: Dict[str, Arch] = {
    a.name: a for a in (BASE, WIDE_CONTEXT, LOCAL_FINE, PRECISION)
}


def find_architecture(name: str) -> Arch:
    """Registry lookup (reference lib/architecture.py enum dispatch)."""
    try:
        return ARCHITECTURES[name]
    except KeyError:
        raise KeyError(
            f"unknown architecture {name!r}; "
            f"available: {sorted(ARCHITECTURES)}"
        ) from None


def register_architecture(arch: Arch) -> None:
    """Extension point: ship trained weights as a new named architecture
    (the plans/train.py export path can feed this)."""
    ARCHITECTURES[arch.name] = arch
