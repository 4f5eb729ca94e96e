"""Shared network-output -> pose decode used by every eval consumer.

The reference decodes predictions inline in its eval loop
(train.py:289-312: per-view class+residual angles composed as
``a2 - a1 + ar``, translations taken directly). This module is the ONE
implementation of that decode (plus the framework's optional flip
resolution) so the trainer's eval loops, the network-refinement pass and
the analysis/quantization scripts cannot drift apart (advisor round-3
finding on scripts/eval_quant.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from alignnet3d_tpu.ops.angle_codec import class_logits_to_angle_np


class DecodedPose(NamedTuple):
    translations: np.ndarray  # (n, 3)
    angles: np.ndarray        # (n,) composed yaw a2 - a1 + ar
    s2_pc1centers: np.ndarray  # (n, 3)
    ang1: np.ndarray          # (n,) per-view decoded yaws
    ang2: np.ndarray


def decode_pair_outputs(out, pc1, pc2, num_bins: int, residual_scale: float,
                        resolve_flips: bool, n: int | None = None
                        ) -> DecodedPose:
    """Decode a forward-pass output dict into relative-pose arrays.

    ``out`` is the model output dict (host numpy after device_get);
    ``pc1``/``pc2`` are the INPUT clouds the flip resolver scores against
    (same arrays that produced ``out``). ``n`` trims eval padding rows.
    """
    if n is None:
        n = len(out["pred_translations"])
    ang1 = class_logits_to_angle_np(
        out["pred_pc1angle_logits"][:n], num_bins, residual_scale)
    ang2 = class_logits_to_angle_np(
        out["pred_pc2angle_logits"][:n], num_bins, residual_scale)
    angr = class_logits_to_angle_np(
        out["pred_remaining_angle_logits"][:n], num_bins, residual_scale)
    composed = ang2 - ang1 + angr
    translations = np.asarray(out["pred_translations"][:n])
    centers = np.asarray(out["pred_s2_pc1centers"][:n])
    if resolve_flips:
        # framework addition: disambiguate theta vs theta+pi by on-device
        # chamfer (ops/flip_resolve.py)
        from alignnet3d_tpu.ops.flip_resolve import apply_flip_resolution

        composed, _ = apply_flip_resolution(
            np.asarray(pc1[:n]), np.asarray(pc2[:n]),
            translations, composed, centers,
        )
    return DecodedPose(translations, composed, centers, ang1, ang2)
