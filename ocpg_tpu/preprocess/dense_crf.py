"""Dense-CRF refinement of pseudo masks (optional stage).

Reference: /root/reference/pre_process/dense_crf.py — binary (:10-36) and
multi-label (:39-54) dense CRF via pydensecrf.  (Dead code in the reference
snapshot — defined but never imported — kept here as the optional refinement
stage it was meant to be.)

pydensecrf is not in this image; this is a numpy mean-field dense CRF whose
message passing uses Gaussian + joint-bilateral filtering (cv2) — the same
structure (appearance + smoothness kernels, softmax updates), with the
permutohedral lattice replaced by separable/bilateral approximations.
"""

from __future__ import annotations

import numpy as np
import cv2


def apply_dense_crf(image: np.ndarray, prob: np.ndarray, n_iters: int = 5,
                    sxy_gaussian: float = 3.0, compat_gaussian: float = 3.0,
                    sxy_bilateral: float = 50.0, srgb_bilateral: float = 13.0,
                    compat_bilateral: float = 10.0) -> np.ndarray:
    """Binary dense CRF.

    image: (H, W, 3) uint8 RGB; prob: (H, W) foreground probability in [0,1].
    Returns refined (H, W) foreground probability.
    """
    prob = prob.clip(1e-5, 1 - 1e-5).astype(np.float32)
    unary = -np.log(np.stack([1 - prob, prob]))       # (2, H, W) negative log-prob
    q = np.stack([1 - prob, prob])
    img = image.astype(np.uint8)

    d = int(2 * sxy_bilateral) | 1
    for _ in range(n_iters):
        msg = np.empty_like(q)
        for c in range(2):
            smooth = cv2.GaussianBlur(q[c], (0, 0), sxy_gaussian)
            bilateral = cv2.ximgproc.jointBilateralFilter(
                img, q[c], d=9, sigmaColor=srgb_bilateral, sigmaSpace=sxy_bilateral
            ) if hasattr(cv2, "ximgproc") else cv2.bilateralFilter(
                q[c], d=9, sigmaColor=srgb_bilateral, sigmaSpace=sxy_bilateral)
            # remove self-contribution approximation and combine kernels
            msg[c] = compat_gaussian * (smooth - q[c]) + compat_bilateral * (bilateral - q[c])
        # compatibility = Potts: cost of the OTHER label's message
        energy = unary + msg[::-1]
        q = np.exp(-energy)
        q /= q.sum(axis=0, keepdims=True)
    return q[1]


def apply_dense_crf_multilabel(image: np.ndarray, probs: np.ndarray,
                               n_iters: int = 5) -> np.ndarray:
    """Multi-label variant (dense_crf.py:39-54). probs: (K, H, W) -> refined."""
    probs = probs.clip(1e-5, 1 - 1e-5).astype(np.float32)
    probs = probs / probs.sum(axis=0, keepdims=True)
    unary = -np.log(probs)
    q = probs.copy()
    img = image.astype(np.uint8)
    for _ in range(n_iters):
        msg = np.stack([
            3.0 * (cv2.GaussianBlur(q[c], (0, 0), 3.0) - q[c])
            + 10.0 * (cv2.bilateralFilter(q[c], 9, 13.0, 50.0) - q[c])
            for c in range(q.shape[0])
        ])
        # Potts compatibility: sum of other labels' messages
        other = msg.sum(axis=0, keepdims=True) - msg
        energy = unary + other
        q = np.exp(-energy)
        q /= q.sum(axis=0, keepdims=True)
    return q
