"""Generate a Ghost-module parity fixture from the *reference* torch code.

The production models don't use GhostConv/GhostBottleneck, but they are part
of the module zoo (SURVEY.md §2.2, reference ``yolov5/models/common.py:211-236``)
and round 1 shipped them with a wrong activation (SiLU on the pw-linear
GhostConv).  This builds a small torch Ghost stack with the reference
modules, saves its state dict + input/output, and the test imports the
weights through the repo's layers and checks numerical parity.

Usage: python tools/make_ghost_golden.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main():
    sys.path.insert(0, os.path.join(REF, "yolov5"))
    from make_golden import _stub_torchvision

    _stub_torchvision()
    import torch

    from models.common import GhostBottleneck, GhostConv

    torch.manual_seed(3)
    stack = torch.nn.Sequential(
        GhostConv(8, 16, 3, 1),
        GhostBottleneck(16, 16, 3, 1),
        GhostBottleneck(16, 24, 5, 2),
    )
    stack.eval()
    # non-trivial BN running stats so fusion is actually exercised; eps/momentum
    # as the reference's initialize_weights sets them on every built model
    # (yolov5/utils/torch_utils.py: BatchNorm2d eps=1e-3, momentum=0.03)
    with torch.no_grad():
        for m in stack.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.eps = 1e-3
                m.momentum = 0.03
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(5)
    x = rng.rand(2, 8, 16, 16).astype(np.float32)
    with torch.no_grad():
        y = stack(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in stack.state_dict().items()}
    np.savez_compressed(os.path.join(OUT, "ghost_golden.npz"),
                        x=x, y=y, **{f"sd.{k}": v for k, v in sd.items()})
    print("ghost_golden:", x.shape, "->", y.shape,
          "|y| mean", float(np.abs(y).mean()))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
