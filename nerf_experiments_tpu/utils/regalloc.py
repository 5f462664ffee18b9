"""Central guard for the known libtpu register-allocation RET_CHECK crashes.

The libtpu AOT pipeline in this image hard-crashes (live_range_finder.cc
RET_CHECK) when a single compiled program gets too large. Empirically mapped
failure modes (RESULTS.md, verify SKILL.md "libtpu/tunnel gotchas"):

1. XLA dense train step with >= ~1M ray-samples per program
   (batch 8192 x 128 samples crashes; 4096 x 128 is fine).
2. The fused Pallas mega-kernel train step survives large batches, EXCEPT
   when the image-pyramid gather grows with resolution: at image_size 400
   (24 views) batch 8192 crashes, 4096 compiles.
3. A Kabsch SVD sharing a program with the renderer (handled structurally
   in render_views.py by hoisting the SVD into its own jit).

This module is the one chokepoint every entry CLI routes its batch size
through, so no default-flag invocation can reach a bare crash. A minimal
repro for mode 1/2 lives in scripts/repro_regalloc.py.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional, Tuple

# Empirical thresholds (one real v5e chip through the axon tunnel).
MAX_SAMPLES_PER_PROGRAM = 1 << 20  # mode 1: 8192*128 crashes, 4096*128 ok
FUSED_PIXEL_GATHER_LIMIT = 24 * 400 * 400  # mode 2 trips at this scene size
FUSED_BATCH_CAP_AT_HIGH_RES = 4096


def safe_batch_size(
    batch_size: int,
    *,
    samples_per_ray: int,
    fused: bool,
    image_size: Optional[int] = None,
    n_images: Optional[int] = None,
) -> Tuple[int, Optional[str]]:
    """Cap ``batch_size`` below the known libtpu regalloc crash thresholds.

    Returns ``(capped_batch, reason_or_None)``. Callers should warn with the
    reason (this function already emits a ``warnings.warn``) and proceed with
    the capped value. Set ``NETPU_NO_REGALLOC_GUARD=1`` to bypass (for repro
    scripts and future libtpu versions).
    """
    if os.environ.get("NETPU_NO_REGALLOC_GUARD"):
        return batch_size, None

    capped = batch_size
    reason = None
    if not fused:
        # mode 1: the XLA dense/proposal path crashes at ~1M samples/program
        while capped > 1024 and capped * samples_per_ray >= MAX_SAMPLES_PER_PROGRAM:
            capped //= 2
        if capped != batch_size:
            reason = (
                f"XLA (non-fused) train step with batch {batch_size} x "
                f"{samples_per_ray} samples >= {MAX_SAMPLES_PER_PROGRAM} "
                "ray-samples/program trips the libtpu regalloc RET_CHECK; "
                f"capped to {capped}. Use --fused_kernel for large batches."
            )
    else:
        # mode 2: fused kernel + large image-stack gather
        pixels = (n_images or 0) * (image_size or 0) * (image_size or 0)
        if pixels >= FUSED_PIXEL_GATHER_LIMIT and batch_size > FUSED_BATCH_CAP_AT_HIGH_RES:
            capped = FUSED_BATCH_CAP_AT_HIGH_RES
            reason = (
                f"fused train step at {n_images} views x {image_size}^2 with "
                f"batch {batch_size}: the in-step image-pyramid gather at this "
                "scene size trips the libtpu regalloc RET_CHECK at batch > "
                f"{FUSED_BATCH_CAP_AT_HIGH_RES}; capped to {capped}."
            )
    if reason is not None:
        warnings.warn(reason, stacklevel=2)
    return capped, reason


def safe_render_chunk(chunk: int, samples_per_ray: int) -> int:
    """Render-path sibling: keep chunks <= 4096 rays x 128 samples."""
    if os.environ.get("NETPU_NO_REGALLOC_GUARD"):
        return chunk
    while chunk > 512 and chunk * samples_per_ray > 4096 * 128:
        chunk //= 2
    return chunk
