"""Self-trained char OCR checkpoint: loader contract + protocol floors.

The reference ships its OCR model only as opaque trained weights
(``weights/char.pt``; the vendored trainer cannot run — SURVEY.md §2.2).
``tools/train_char_ocr.py`` trains the same architecture from scratch with
this repo's YOLO trainer; these tests pin (a) the native-npz loading
contract every CLI uses and (b) that the self-trained model actually reads
plates under the published protocol semantics.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "char_ocr_synth.npz")
GLARE_LPSR = os.path.join(REPO, "checkpoints", "lpsr_synth_glare",
                          "best_model.npz")

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="self-trained char OCR ckpt missing")


@needs_ckpt
def test_char_ocr_npz_loader_contract():
    import jax.numpy as jnp

    from lpr_tpu.models.yolo import load_char_ocr

    model, params, ck = load_char_ocr(CKPT)
    assert model.anchors.shape == (1, 2, 2)  # single scale, 2 anchors
    assert model.strides == (8,)
    assert len(ck.names) == 36
    pred, raws = model.apply(params, jnp.zeros((1, 128, 128, 3)))
    assert pred.shape == (1, 512, 41)  # 16*16*2 preds, 5+36 (config.pbtxt)
    assert len(raws) == 1 and raws[0].shape == (1, 2, 16, 16, 41)
    # fp16-stored, fp32-restored
    leaf = np.asarray(params[0]["conv"]["w"]
                      if isinstance(params[0], dict) and "conv" in params[0]
                      else next(iter(np.load(CKPT).values())))
    assert np.isfinite(leaf).all()


@needs_ckpt
@pytest.mark.slow
def test_selftrained_char_ocr_reads_protocol(tmp_path):
    """r3c-regime protocol slice with the SELF-TRAINED OCR (+ the committed
    glare LPSR): the fully self-trained stack must read plates materially,
    with SR still improving the read (floors well below the measured run —
    see tools/train_char_ocr.py --protocol-check output in the commit)."""
    if not os.path.exists(GLARE_LPSR):
        pytest.skip("glare LPSR checkpoint missing")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_eval_set

    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr

    out = str(tmp_path / "eval16_selftrained")
    make_eval_set.main([
        "--out", out, "--n", "16",
        "--sigma", "0.8", "1.2", "--noise", "0.010", "0.020",
        "--scale", "0.55", "--wash", "0.60", "0.85",
        "--glare-p", "0.3", "--render-style", "plate"])

    char, char_params, ck = load_char_ocr(CKPT)
    lcfg = LPSRConfig()
    lp = load_lpsr(GLARE_LPSR, lcfg)
    ev = OcrEvaluator(char, char_params, lp, lcfg, names=ck.names)
    rep = ev.evaluate_folder(out, batch_size=16)
    # measured at n=64: raw 57.8 % acc / 8.0 % CER, SR 75.0 % / 3.6 %
    # (tools/train_char_ocr.py --protocol-check); floors leave room for
    # the n=16 slice's sampling noise
    assert rep.acc_raw >= 0.25, rep.summary()
    assert rep.cer_raw <= 0.30, rep.summary()
    assert rep.acc_sr >= 0.40, rep.summary()
    assert rep.cer_sr <= 0.20, rep.summary()
