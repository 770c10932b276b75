"""YOLOv5 training loss, fixed-shape JAX.

Reference: ``yolov5/utils/loss.py:91-222`` (ComputeLoss + build_targets):
CIoU box loss, BCE objectness with IoU-weighted targets and per-level
balance [4.0, 1.0, 0.4], BCE classification with label smoothing;
target assignment = anchor wh-ratio filter (``anchor_t``) + 3-cell neighbor
assignment (center + up to 2 adjacent cells, offset g=0.5).

TPU re-design: the reference builds dynamically-sized index lists per batch
(``t[j]`` boolean indexing).  Here every (anchor, target, offset) candidate
is materialized as a fixed (na, T, 5) lattice with a validity mask; gathers/
scatters replace indexing, masked means replace filtered means.  Everything
jits with static shapes and batches.

Labels: (B, T, 5) float — [class, cx, cy, w, h] normalized to [0,1],
padded rows have w == 0.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from lpr_tpu.ops.boxes import bbox_ciou


@dataclasses.dataclass(frozen=True)
class YoloLossConfig:
    """Hyperparameters (reference data/hyps/hyp.scratch-low.yaml defaults)."""

    box: float = 0.05
    obj: float = 1.0
    cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    label_smoothing: float = 0.0
    gr: float = 1.0  # iou ratio for obj targets


_BALANCE = {1: [4.0], 2: [4.0, 1.0], 3: [4.0, 1.0, 0.4],
            5: [4.0, 1.0, 0.25, 0.06, 0.02]}

# center + 4 neighbors, gated (loss.py:184-190)
_OFFSETS = jnp.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
) * 0.5


def _bce_logits(logits, targets, pos_weight=1.0):
    """BCEWithLogits, elementwise."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)


def build_targets_level(
    labels: jnp.ndarray,   # (T, 5) [cls, cx, cy, w, h] normalized
    anchors: jnp.ndarray,  # (na, 2) grid units
    grid_hw: Tuple[int, int],
    anchor_t: float,
):
    """Candidate lattice for one image and one level.

    Returns dict of (na, T, 5) arrays: cell indices gi/gj, anchor index,
    class, target box (dx, dy, w, h in grid units), valid mask.
    """
    ny, nx = grid_hw
    na = anchors.shape[0]
    T = labels.shape[0]
    valid = labels[:, 3] > 0  # (T,)
    cls = labels[:, 0]
    gxy = labels[:, 1:3] * jnp.asarray([nx, ny], jnp.float32)  # (T, 2)
    gwh = labels[:, 3:5] * jnp.asarray([nx, ny], jnp.float32)

    # anchor ratio filter (loss.py:179-182)
    r = gwh[None, :, :] / anchors[:, None, :]  # (na, T, 2)
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)  # (na, T)
    a_ok = (ratio < anchor_t) & valid[None, :]

    # neighbor-cell gates (loss.py:184-189)
    gx, gy = gxy[:, 0], gxy[:, 1]
    j = (gx % 1.0 < 0.5) & (gx > 1.0)
    k = (gy % 1.0 < 0.5) & (gy > 1.0)
    l = ((nx - gx) % 1.0 < 0.5) & (nx - gx > 1.0)
    m = ((ny - gy) % 1.0 < 0.5) & (ny - gy > 1.0)
    off_ok = jnp.stack([jnp.ones_like(j), j, k, l, m], -1)  # (T, 5)

    # candidate lattice (na, T, 5)
    mask = a_ok[:, :, None] & off_ok[None, :, :]
    gxy_c = gxy[None, :, None, :] - _OFFSETS[None, None, :, :]  # (1, T, 5, 2)
    gij = jnp.floor(gxy_c).astype(jnp.int32)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    gi = jnp.broadcast_to(gi, (na, T, 5))
    gj = jnp.broadcast_to(gj, (na, T, 5))
    dxy = gxy[None, :, None, :] - jnp.concatenate(
        [gi[0][..., None], gj[0][..., None]], -1
    ).astype(jnp.float32)  # (1, T, 5, 2)
    dxy = jnp.broadcast_to(dxy, (na, T, 5, 2))
    twh = jnp.broadcast_to(gwh[None, :, None, :], (na, T, 5, 2))
    tbox = jnp.concatenate([dxy, twh], -1)  # (na, T, 5, 4)
    return {
        "gi": gi, "gj": gj, "tbox": tbox,
        "cls": jnp.broadcast_to(cls[None, :, None], (na, T, 5)),
        "mask": mask,
    }


def yolo_loss(
    raws: List[jnp.ndarray],      # per level (B, na, ny, nx, 5+nc) logits
    labels: jnp.ndarray,          # (B, T, 5)
    anchors: jnp.ndarray,         # (nl, na, 2) grid units
    cfg: YoloLossConfig = YoloLossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss * batch_size (reference scaling, loss.py:166) + components."""
    nl = len(raws)
    balance = _BALANCE[nl]
    B = raws[0].shape[0]
    nc = raws[0].shape[-1] - 5
    cp = 1.0 - 0.5 * cfg.label_smoothing
    cn = 0.5 * cfg.label_smoothing

    lbox = jnp.float32(0.0)
    lobj = jnp.float32(0.0)
    lcls = jnp.float32(0.0)

    for li, p in enumerate(raws):
        _, na, ny, nx, no = p.shape
        anc = anchors[li]

        per_img = jax.vmap(
            lambda lab: build_targets_level(lab, anc, (ny, nx), cfg.anchor_t)
        )(labels)
        gi = per_img["gi"]      # (B, na, T, 5)
        gj = per_img["gj"]
        tbox = per_img["tbox"]  # (B, na, T, 5, 4)
        tcls = per_img["cls"]
        mask = per_img["mask"]  # (B, na, T, 5)
        w = mask.astype(jnp.float32)
        n_pos = jnp.maximum(w.sum(), 1.0)

        # gather predictions at candidate cells: ps (B, na, T, 5, no)
        a_idx = jnp.arange(na)[None, :, None, None]
        b_idx = jnp.arange(B)[:, None, None, None]
        ps = p[b_idx, a_idx, gj, gi]

        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anc[None, :, None, None, :]
        pbox = jnp.concatenate([pxy, pwh], -1)
        iou = bbox_ciou(pbox, tbox)  # (B, na, T, 5)
        lbox = lbox + ((1.0 - iou) * w).sum() / n_pos

        # objectness targets: scatter max(iou) into the cell map
        iou_d = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None)) * w
        tobj = jnp.zeros((B, na, ny, nx), jnp.float32)
        tobj = tobj.at[b_idx, a_idx, gj, gi].max(cfg.gr * iou_d + (1.0 - cfg.gr) * w)
        obj_bce = _bce_logits(p[..., 4], tobj, cfg.obj_pw)
        lobj = lobj + obj_bce.mean() * balance[li]

        if nc > 1:
            t_onehot = jax.nn.one_hot(tcls.astype(jnp.int32), nc) * (cp - cn) + cn
            cls_bce = _bce_logits(ps[..., 5:], t_onehot, cfg.cls_pw)
            lcls = lcls + (cls_bce.mean(-1) * w).sum() / n_pos

    lbox = lbox * cfg.box
    lobj = lobj * cfg.obj
    lcls = lcls * cfg.cls
    total = (lbox + lobj + lcls) * B
    return total, {"box": lbox, "obj": lobj, "cls": lcls}
