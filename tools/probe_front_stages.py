"""Probe: internal cost split of the fused front kernel.

Builds cut-down variants of the front kernel (stem only / stem+down1 /
full) plus a DMA-only pass, to attribute the kernel's runtime to its
stages.  Diagnostic tool only — variants share geometry + weights with
the production kernel but write garbage for the skipped stages.

    python tools/probe_front_stages.py [--batch 32]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def timed(name, fn, *args, steps=20, reps=3):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        def body(acc, i):
            first = a[0] + i.astype(a[0].dtype)
            out = fn(first, *a[1:])
            dep = sum(jnp.asarray(x, jnp.float32).sum()
                      for x in jax.tree.leaves(out))
            return acc + dep, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(steps))
        return acc

    f = jax.jit(chained)
    np.asarray(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{name:34s} {best*1e3:8.2f} ms/step", flush=True)
    return best


def make_variant(stage):
    """stage: 'dma' | 'stem' | 'down' | 'full'."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lpr_tpu.ops.pallas import yolo_front as yf

    g = yf._G0
    bf = jnp.bfloat16

    def kernel(x_hbm, w0, b0, w1, b1, w12, b12, wm1, bm1, wm2, bm2, w3,
               b3, out_ref, xw, a0, sq, a1, dbuf, p1, a2, cbuf, sem):
        b = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(jnp.logical_and(b == 0, s == 0))
        def _():
            for ref in (a0, sq, a2, dbuf, p1):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        c = b * g.nstrip + s
        slot = c % 2

        def strip_copy(cell, sl):
            cb = cell // g.nstrip
            cs = cell % g.nstrip
            return pltpu.make_async_copy(
                x_hbm.at[cb, :, pl.ds(g.strip * cs * g.cp, g.win * g.cp)],
                xw.at[sl], sem.at[sl])

        @pl.when(c == 0)
        def _():
            strip_copy(0, 0).start()
        nb = pl.num_programs(0) * g.nstrip

        @pl.when(c + 1 < nb)
        def _():
            strip_copy(c + 1, (c + 1) % 2).start()
        strip_copy(c, slot).wait()
        xws = xw.at[slot]

        if stage == "dma":
            out_ref[0] = xws[:, 2 * g.cp:(g.strip + 2) * g.cp]
            return

        def domain_mask(nrows, row0, nvalid, step=1):
            l = jax.lax.broadcasted_iota(jnp.int32, (1, nrows * g.cp), 1)
            q = l % g.cp
            t = row0 + step * (l // g.cp)
            return (q >= 4) & (q < 4 + g.cols) & (t >= 0) & (t < nvalid)

        W0 = w0[...]
        NQ = g.kq * g.cp
        for rho in (0, 1):
            rtap = yf._TAP_EVEN if rho == 0 else yf._TAP_ODD
            for pi in (0, 1):
                ctap = yf._TAP_EVEN if pi == 0 else yf._TAP_ODD
                off = (2 * rho + pi) * NQ
                for dr in range(3):
                    rs, kd = rtap[dr]
                    for dx in range(3):
                        ps, cd = ctap[dx]
                        k = dr * 3 + dx
                        src = 16 * (2 * rs + ps)
                        base = (2 + kd) * g.cp + cd
                        a0[16 * k:16 * k + 12, off:off + NQ] = (
                            xws[src:src + 12, base:base + NQ])
        y4 = jnp.dot(W0, a0[...], preferred_element_type=jnp.float32)
        y4 = yf._silu_f32(y4 + b0[...])
        for rho in (0, 1):
            for pi in (0, 1):
                off = (2 * rho + pi) * NQ
                ok = domain_mask(g.kq, 2 * (g.strip * s - 2) + rho, g.rows,
                                 step=2)
                pr = 32 * (2 * rho + pi)
                sq[pr:pr + 32, g.cp:(g.kq + 1) * g.cp] = (
                    jnp.where(ok, y4[:, off:off + NQ], 0.0).astype(bf))

        if stage == "stem":
            out_ref[0, 0:64] = sq[0:64, g.cp:(g.strip + 1) * g.cp]
            return

        W1 = w1[...]
        ND = g.drows * g.cp
        for dr in range(3):
            rs, kd = yf._TAP_EVEN[dr]
            for dx in range(3):
                ps, cd = yf._TAP_EVEN[dx]
                k = dr * 3 + dx
                pr = 32 * (2 * rs + ps)
                base = (2 + kd) * g.cp + cd
                a1[32 * k:32 * k + 32, :] = sq[pr:pr + 32, base:base + ND]
        y = jnp.dot(W1, a1[...], preferred_element_type=jnp.float32)
        y = yf._silu_f32(y + b1[...])
        ok = domain_mask(g.drows, g.strip * s - 1, g.c3rows)
        dbuf[:, g.cp:(g.drows + 1) * g.cp] = jnp.where(ok, y, 0.0).astype(bf)

        if stage == "down":
            out_ref[0] = dbuf[:, 2 * g.cp:(g.strip + 2) * g.cp]
            return

        W12 = w12[...]
        y = jnp.dot(W12, dbuf[:, g.cp:(g.drows + 1) * g.cp],
                    preferred_element_type=jnp.float32)
        y = yf._silu_f32(y + b12[...])
        c3_okd = domain_mask(g.drows, g.strip * s - 1, g.c3rows)
        y = jnp.where(c3_okd, y, 0.0)
        p1[0:32, g.cp:(g.drows + 1) * g.cp] = y[0:32].astype(bf)
        p2 = y[32:64, g.cp:(g.strip + 1) * g.cp]

        Wm1 = wm1[...]
        ym1 = jnp.dot(Wm1, p1[0:32, g.cp:(g.drows + 1) * g.cp],
                      preferred_element_type=jnp.float32)
        ym1 = yf._silu_f32(ym1 + bm1[...])
        p1[32:64, g.cp:(g.drows + 1) * g.cp] = jnp.where(
            c3_okd, ym1, 0.0).astype(bf)

        NC = g.strip * g.cp
        for dr in range(3):
            for dx in range(3):
                k = dr * 3 + dx
                base = (dr + 1) * g.cp + dx - 1
                a2[32 * k:32 * k + 32, :] = p1[32:64, base:base + NC]
        Wm2 = wm2[...]
        ym2 = jnp.dot(Wm2, a2[...], preferred_element_type=jnp.float32)
        ym2 = yf._silu_f32(ym2 + bm2[...])
        c3_oks = domain_mask(g.strip, g.strip * s, g.c3rows)
        ym2 = jnp.where(c3_oks, ym2, 0.0)
        m1 = ym2.astype(bf) + p1[0:32, 2 * g.cp:(g.strip + 2) * g.cp]

        cbuf[0:32, :] = m1
        cbuf[32:64, :] = p2.astype(bf)
        W3 = w3[...]
        yo = jnp.dot(W3, cbuf[...], preferred_element_type=jnp.float32)
        yo = yf._silu_f32(yo + b3[...])
        yo = jnp.where(c3_oks, yo, 0.0).astype(bf)
        out_ref[0] = yo

    @jax.jit
    def run(xp, w):
        B = xp.shape[0]
        grid = (B, g.nstrip)
        wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 64, g.c3rows * g.cp), bf),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + wspecs,
            out_specs=pl.BlockSpec(
                (1, 64, g.strip * g.cp), lambda b, s: (b, 0, s),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 64, g.win * g.cp), bf),
                pltpu.VMEM((144, 4 * g.kq * g.cp), bf),
                pltpu.VMEM((128, (g.kq + 2) * g.cp), bf),
                pltpu.VMEM((288, g.drows * g.cp), bf),
                pltpu.VMEM((64, (g.drows + 2) * g.cp), bf),
                pltpu.VMEM((64, (g.drows + 2) * g.cp), bf),
                pltpu.VMEM((288, g.strip * g.cp), bf),
                pltpu.VMEM((64, g.strip * g.cp), bf),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, w["w0"], w["b0"], w["w1"], w["b1"], w["w12"], w["b12"],
          w["wm1"], w["bm1"], w["wm2"], w["bm2"], w["w3"], w["b3"])

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.ops.pallas import yolo_front as yf

    g = yf._G0
    rng = np.random.RandomState(0)
    xp = jnp.asarray(
        rng.rand(args.batch, 64, g.rp * g.cp).astype(np.float32) - 0.5,
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def rw(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, jnp.float32) * 0.1

    w = {
        "w0": rw(32, 144).astype(jnp.bfloat16),
        "b0": rw(32, 1),
        "w1": rw(64, 288).astype(jnp.bfloat16),
        "b1": rw(64, 1),
        "w12": rw(64, 64).astype(jnp.bfloat16),
        "b12": rw(64, 1),
        "wm1": rw(32, 32).astype(jnp.bfloat16),
        "bm1": rw(32, 1),
        "wm2": rw(32, 288).astype(jnp.bfloat16),
        "bm2": rw(32, 1),
        "w3": rw(64, 64).astype(jnp.bfloat16),
        "b3": rw(64, 1),
    }

    for stage in ("dma", "stem", "down", "full"):
        timed(f"front[{stage}]", make_variant(stage), xp, w)


if __name__ == "__main__":
    main()
