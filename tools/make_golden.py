"""Generate golden parity fixtures by running the *reference* PyTorch models.

Run once (CPU torch) to produce small .npz fixtures committed under
tests/fixtures/.  The reference tree at /root/reference is imported only
here, never from the framework itself.

Usage: python tools/make_golden.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _stub_torchvision():
    """torchvision is not installed; the reference only needs ops.nms.
    Provide a plain-torch greedy NMS (standard algorithm) so the reference
    code paths run unmodified."""
    import types

    import torch

    def nms(boxes, scores, iou_thres):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a_i + a_r - inter)
            order = rest[iou <= iou_thres]
        return torch.tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.nms = nms
    tv.__version__ = "0.0-stub"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops

    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")

        def parse_version(v):
            return tuple(int("".join(c for c in x if c.isdigit()) or 0)
                         for x in str(v).split("+")[0].split("."))

        pr.parse_version = parse_version
        sys.modules["pkg_resources"] = pr

    # utils.plots downloads a font at import time (no egress here); the model
    # code only needs these names to exist.
    if "utils.plots" not in sys.modules:
        up = types.ModuleType("utils.plots")
        up.Annotator = object
        up.colors = lambda *a, **k: (0, 0, 0)
        up.save_one_box = lambda *a, **k: None
        up.feature_visualization = lambda *a, **k: None
        sys.modules["utils.plots"] = up


def make_lpsr_golden():
    sys.path.insert(0, REF)
    _stub_torchvision()
    import torch

    from my_models.lpsr import LPSR  # reference model definition

    torch.manual_seed(0)
    model = LPSR(
        num_channels=3, num_features=32, growth_rate=16, num_blocks=4,
        num_layers=4, scale_factor=None,
    )
    ckpt = torch.load(os.path.join(REF, "weights/best_model.pth"), map_location="cpu")
    model.load_state_dict(ckpt.get("model_state_dict", ckpt))
    model.eval()

    rng = np.random.RandomState(42)
    x = rng.rand(2, 3, 32, 192).astype(np.float32)  # NCHW in [0,1]
    with torch.no_grad():
        y = model(torch.from_numpy(x)).numpy()
    np.savez_compressed(
        os.path.join(OUT, "lpsr_golden.npz"), x=x, y=y,
    )
    print("lpsr_golden:", x.shape, "->", y.shape, "range", y.min(), y.max())


def make_char_yolo_golden():
    sys.path.insert(0, os.path.join(REF, "yolov5"))
    _stub_torchvision()
    import torch

    from models.experimental import attempt_load

    model = attempt_load(os.path.join(REF, "weights/char.pt"), map_location="cpu")
    model.eval().float()

    rng = np.random.RandomState(7)
    x = rng.rand(2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        pred, feats = model(torch.from_numpy(x), augment=False)
    np.savez_compressed(
        os.path.join(OUT, "char_yolo_golden.npz"),
        x=x,
        pred=pred.numpy(),
        stride=model.stride.numpy(),
    )
    print("char_yolo_golden:", x.shape, "->", pred.shape)


def make_nms_golden():
    """Golden NMS behavior from the reference implementation on the char
    model's real predictions."""
    sys.path.insert(0, os.path.join(REF, "yolov5"))
    _stub_torchvision()
    import torch
    from utils.general import non_max_suppression

    d = np.load(os.path.join(OUT, "char_yolo_golden.npz"))
    pred = torch.from_numpy(d["pred"])
    out = non_max_suppression(
        pred, conf_thres=0.25, iou_thres=0.3, agnostic=True, multi_label=True,
        max_det=1000,
    )
    np.savez_compressed(
        os.path.join(OUT, "nms_golden.npz"),
        **{f"det{i}": o.numpy() for i, o in enumerate(out)},
    )
    print("nms_golden:", [tuple(o.shape) for o in out])

    # Denser synthetic case: clustered boxes with a spread of confidences,
    # raw-prediction format (xywh, obj, cls-probs) like the Detect output.
    rng = np.random.RandomState(3)
    n, nc = 400, 36
    cx = rng.uniform(10, 118, n)
    cy = rng.uniform(10, 118, n)
    w = rng.uniform(4, 30, n)
    h = rng.uniform(6, 40, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.dirichlet(np.ones(nc) * 0.2, n) * rng.uniform(0.5, 1.0, (n, 1))
    raw = np.concatenate(
        [np.stack([cx, cy, w, h, obj], 1), cls], 1
    ).astype(np.float32)[None]
    out2 = non_max_suppression(
        torch.from_numpy(raw.copy()), conf_thres=0.25, iou_thres=0.45,
        agnostic=True, multi_label=True, max_det=300,
    )
    np.savez_compressed(
        os.path.join(OUT, "nms_synth_golden.npz"), raw=raw, det=out2[0].numpy()
    )
    print("nms_synth_golden:", out2[0].shape)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    make_lpsr_golden()
    make_char_yolo_golden()
    make_nms_golden()
