"""TPU hardware constants derived from the attached device, not hard-coded.

Every artifact that reports MFU or HBM headroom gets its peak FLOP/s and HBM
capacity from here, and records which device kind the numbers assume — so
running the same script on a different TPU generation yields correct numbers
instead of silently reporting v5e math (ADVICE r4: bench.py/bench_train.py
hard-coded 197e12 and hbm_envelope.py 16 GiB).

Sources: published per-chip peak dense bf16 FLOP/s and HBM capacity for each
TPU generation (v4/v5e/v5p/v6e public specs).  Unknown kinds fall back to v5e
numbers with ``assumed=True`` so callers can flag the guess in their output.
"""

from __future__ import annotations

from dataclasses import dataclass

# kind-substring -> (peak dense bf16 FLOP/s per chip, HBM bytes per chip)
_SPECS = {
    "v6e": (918e12, 32 * 1024**3),      # Trillium
    "v6": (918e12, 32 * 1024**3),
    "v5p": (459e12, 95 * 1024**3),
    "v5e": (197e12, 16 * 1024**3),
    "v5 lite": (197e12, 16 * 1024**3),  # device_kind string on v5e ("TPU v5 lite")
    "v5lite": (197e12, 16 * 1024**3),
    "v4": (275e12, 32 * 1024**3),
    "v3": (123e12, 32 * 1024**3),       # 2 cores/chip, 16 GiB/core
    "v2": (45e12, 16 * 1024**3),
}

_DEFAULT = ("v5e (assumed)", 197e12, 16 * 1024**3)


@dataclass(frozen=True)
class TpuSpec:
    kind: str            # raw device_kind string (or fallback label)
    peak_flops_bf16: float
    hbm_bytes: int
    assumed: bool        # True when the kind was not recognized (v5e fallback)


def tpu_spec(device=None) -> TpuSpec:
    """Spec of `device` (default: jax.devices()[0]).

    Works on CPU too (returns the v5e fallback with assumed=True) so scripts
    stay runnable off-chip for smoke tests.
    """
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = str(getattr(device, "device_kind", "") or "").lower()
    for sub, (flops, hbm) in _SPECS.items():
        if sub in kind:
            return TpuSpec(kind=kind, peak_flops_bf16=flops,
                           hbm_bytes=int(hbm), assumed=False)
    label, flops, hbm = _DEFAULT
    return TpuSpec(kind=kind or label, peak_flops_bf16=flops,
                   hbm_bytes=int(hbm), assumed=True)
