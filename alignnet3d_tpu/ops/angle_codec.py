"""Yaw bin/residual codec, in JAX (jit-safe, batched) and numpy (eval parity).

Reference semantics: models/tp8.py:181-301. A yaw angle is encoded as a
discrete bin (``num_bins`` bins of width 2pi/num_bins, centers at
``k * 2pi/num_bins``) plus a residual in ``[-pi/num_bins, pi/num_bins]``.
The model's angle heads emit ``[num_bins]`` class logits followed by
``[num_bins]`` *normalized* residuals (residual / (pi/num_bins)).

Faithful-port note (preserved, flag-controlled): at eval time the reference
decodes logits with the residual **unscaled** (classLogits2angle,
tp8.py:241-244 uses the raw head output as radians), while inside the graph
it scales by pi/num_bins (tf_get_angles, tp8.py:294-301). ``residual_scale``
makes the choice explicit: pass ``1.0`` for reference-eval behavior and
``pi/num_bins`` for the in-graph behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi


def angle2class(angle: jax.Array, num_bins: int):
    """Continuous yaw -> (bin id, residual). Batched over leading dims.

    Matches tf_angle2class (reference tp8.py:181-199): bins centered at
    ``k * 2pi/N``; residual in ``[-pi/N, pi/N)``.
    """
    angle = jnp.mod(angle, TWO_PI)
    angle_per_class = TWO_PI / num_bins
    shifted = jnp.mod(angle + angle_per_class / 2.0, TWO_PI)
    class_id = (shifted / angle_per_class).astype(jnp.int32)
    residual = shifted - (
        class_id.astype(angle.dtype) * angle_per_class + angle_per_class / 2.0
    )
    return class_id, residual


def class2angle(class_id, residual, num_bins: int, to_label_format: bool = True):
    """(bin id, residual) -> yaw. Batched. Reference tf_class2angle
    (tp8.py:202-212)."""
    angle_per_class = TWO_PI / num_bins
    angle = class_id.astype(jnp.float32) * angle_per_class + residual
    if to_label_format:
        angle = jnp.mod(angle + jnp.pi, TWO_PI) - jnp.pi
    return angle


def logits_to_angle(logits: jax.Array, num_bins: int, residual_scale: float):
    """Decode ``[..., 2*num_bins]`` head output to yaw (argmax bin + that
    bin's residual * residual_scale). Batched, jit-safe.

    ``residual_scale=pi/num_bins`` reproduces tf_get_angles (tp8.py:294-301);
    ``residual_scale=1.0`` reproduces the eval-time classLogits2angle
    (tp8.py:241-244).
    """
    class_logits = logits[..., :num_bins]
    residuals = logits[..., num_bins:] * residual_scale
    classes = jnp.argmax(class_logits, axis=-1)
    per_class_residual = jnp.take_along_axis(
        residuals, classes[..., None], axis=-1
    )[..., 0]
    return class2angle(classes, per_class_residual, num_bins)


def class_logits_to_angle_np(logits: np.ndarray, num_bins: int,
                             residual_scale: float = 1.0) -> np.ndarray:
    """Numpy eval-path decoder, parity oracle for reference
    classLogits2angle (tp8.py:241-244). Default residual_scale=1.0 keeps the
    reference's unscaled-residual quirk."""
    logits = np.asarray(logits)
    class_logits = logits[..., :num_bins]
    residuals = logits[..., num_bins:] * residual_scale
    classes = np.argmax(class_logits, axis=-1)
    per_class_residual = np.take_along_axis(
        residuals, classes[..., None], axis=-1
    )[..., 0]
    angle_per_class = TWO_PI / num_bins
    angle = classes * angle_per_class + per_class_residual
    # reference class2angle subtracts 2pi only when angle > pi (tp8.py:236-237)
    return np.where(angle > np.pi, angle - TWO_PI, angle)


def soft_angle_targets(target_angles_deg: jax.Array, num_bins: int,
                       sigma_in_degree: float) -> jax.Array:
    """Soft per-bin target distribution from three stitched Normal CDFs.

    Reference tf_get_target_angle_distribution (tp8.py:253-263): three
    normals at {t-360, t, t+360} degrees give circular wrap-around; CDF
    differences over bin edges yield probabilities summing to 1. Batched over
    the leading dim (the reference maps per sample; here it's one shot).

    Args:
      target_angles_deg: (B,) target angles in DEGREES (caller converts, the
        reference feeds degrees: bins span 360/num_bins degrees).
    """
    t = target_angles_deg[:, None, None]  # (B, 1, 1)
    locs = t + jnp.asarray([-360.0, 0.0, 360.0])[None, None, :]  # (B,1,3)
    angle_per_bin = 360.0 / num_bins
    edges = (
        jnp.arange(num_bins + 1, dtype=jnp.float32) * angle_per_bin
    )[None, :, None]  # (1, nbins+1, 1)
    z = (edges - locs) / (sigma_in_degree * np.sqrt(2.0))
    cdf = 0.5 * (1.0 + jax.lax.erf(z))  # (B, nbins+1, 3)
    probs = jnp.roll(cdf, -1, axis=1) - cdf
    probs = jnp.sum(probs, axis=2)  # (B, nbins+1)
    return probs[:, :-1]


def jax_angle_diff(a, b):
    """Signed smallest difference b - a wrapped to (-pi, pi] (reference
    tf_get_angle_difference, tp8.py:161-164)."""
    r = jnp.mod(b - a, TWO_PI)
    return jnp.where(r > jnp.pi, r - TWO_PI, r)
