"""Microbenchmark of the detector/LPSR conv workloads on the TPU.

Times each distinct conv shape in the yolov5s @736x1280 + LPSR + char-OCR
programs and reports achieved TFLOP/s vs the v5e bf16 peak, to target
layout/kernel work at the layers XLA runs worst.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lpr_tpu.ops import nn as tnn

    B = 32
    S = 20
    # (name, H, W, Cin, Cout, k, stride, batch)
    cases = [
        ("stem S2D 12->32 @368x640", 368, 640, 12, 32, 3, 1, B),
        ("down 32->64 s2 @368x640", 368, 640, 32, 64, 3, 2, B),
        ("C3 b1 32->32 @184x320", 184, 320, 32, 32, 1, 1, B),
        ("C3 b3 32->32 @184x320 k3", 184, 320, 32, 32, 3, 1, B),
        ("down 64->128 s2 @184x320", 184, 320, 64, 128, 3, 2, B),
        ("C3 64->64 @92x160 k3", 92, 160, 64, 64, 3, 1, B),
        ("down 128->256 s2 @92x160", 92, 160, 128, 256, 3, 2, B),
        ("C3 128->128 @46x80 k3", 46, 80, 128, 128, 3, 1, B),
        ("down 256->512 s2 @46x80", 46, 80, 256, 512, 3, 2, B),
        ("C3 256->256 @23x40 k3", 23, 40, 256, 256, 3, 1, B),
        ("det head 128->48 1x1 @92x160", 92, 160, 128, 48, 1, 1, B),
        # LPSR inner shapes (96 crops of 32x192, f=32, g=16)
        ("lpsr rdb 32->16 k3 @32x192", 32, 192, 32, 16, 3, 1, 3 * B),
        ("lpsr rdb 80->32 1x1 @32x192", 32, 192, 80, 32, 1, 1, 3 * B),
        ("lpsr ae dconv dw5x5 @16x96", 16, 96, 48, 48, 5, 1, 3 * B),
        # char OCR inner shapes (192 canvases of 128x128)
        ("char C3 32->32 k3 @32x32", 32, 32, 32, 32, 3, 1, 6 * B),
        ("char C3TR qkv 256 tok", 0, 0, 0, 0, 0, 0, 0),  # skipped marker
    ]

    rng = np.random.RandomState(0)
    for (name, H, W, Ci, Co, k, s, batch) in cases:
        if H == 0:
            continue
        x = jnp.asarray(rng.rand(batch, H, W, Ci).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, Ci, Co).astype(np.float32) * 0.01
                        ).astype(jnp.bfloat16)

        def run(x0, w0):
            def body(carry, i):
                y = tnn.conv2d(carry[0] if False else x0 + i.astype(x0.dtype),
                               w0, stride=s)
                return (x0,), y.mean().astype(jnp.float32)
            _, outs = jax.lax.scan(body, (x0,), jnp.arange(S))
            return outs.sum()

        f = jax.jit(run)
        np.asarray(f(x, w))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x, w))
            best = min(best, time.perf_counter() - t0)
        dt = best / S
        flops = 2 * batch * (H // s) * (W // s) * Ci * Co * k * k
        tf = flops / dt / 1e12
        print(f"{name:34s} {dt*1e3:7.3f} ms  {tf:7.1f} TF/s "
              f"({100*tf/197:4.1f}% peak)")


if __name__ == "__main__":
    main()
