"""Eval harness tests: CER math + the end-to-end SR-improves-OCR regression
on real LR plates (crops extracted from the reference's published report
image imgs/sr_convincing_improvements.png, GT in filenames)."""

import os

import pytest

from lpr_tpu.eval.harness import cer, levenshtein

from .conftest import REF_CHAR, REF_LPSR, requires_ref

REAL_PLATES = os.path.join(os.path.dirname(__file__), "fixtures", "real_plates")
REAL_PLATES2 = os.path.join(os.path.dirname(__file__), "fixtures",
                            "real_plates2")
GLARE_LPSR = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                          "lpsr_synth_glare", "best_model.npz")


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "axc") == 1
    assert levenshtein("abc", "ab") == 1
    assert levenshtein("abc", "xabc") == 1
    assert levenshtein("kitten", "sitting") == 3


def test_cer():
    assert cer("ABC", "ABC") == 0.0
    assert cer("ABC", "AXC") == pytest.approx(1 / 3)
    assert cer("", "") == 0.0
    assert cer("", "X") == 1.0


@requires_ref
@pytest.mark.slow
def test_sr_improves_ocr_on_real_plates():
    """The framework's north-star behavior (BASELINE.md): on real low-res
    plates, SR->OCR must massively beat raw OCR — mirroring the reference's
    published +19.7pt accuracy / -18.3pt CER improvement."""
    from lpr_tpu.models.lpsr import load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr
    from lpr_tpu.eval.harness import OcrEvaluator

    model, params, ck = load_char_ocr(REF_CHAR)
    lpsr = load_lpsr(REF_LPSR)
    ev = OcrEvaluator(model, params, lpsr, names=ck.names, ocr_conf=0.5)
    rep = ev.evaluate_folder(REAL_PLATES, batch_size=8)
    assert rep.n == 6
    assert rep.acc_sr >= 0.5          # >= 3/6 exact with SR
    assert rep.acc_sr > rep.acc_raw   # SR strictly improves
    assert rep.cer_sr < 0.15
    assert rep.cer_raw > 0.5          # raw OCR fails on these LR crops


@requires_ref
@pytest.mark.slow
def test_sr_improves_ocr_on_report_plates():
    """Round-4 real fixtures (tools/mine_report_plates.py: the README demo
    frame's two LR plates + three realsr.png HR captures).  Guards the
    measured floors for the SELF-TRAINED glare checkpoint (EVAL_r4/
    glare_real2.json: raw 0%/40% CER -> SR 40%/27.5% CER): the framework's
    own training stack must keep transferring to real captures."""
    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr
    from lpr_tpu.weights.checkpoint import load_params
    from lpr_tpu.models.lpsr import lpsr_init

    if not os.path.exists(GLARE_LPSR):
        pytest.skip("glare LPSR checkpoint missing")
    import jax

    model, params, ck = load_char_ocr(REF_CHAR)
    cfg = LPSRConfig()
    lpsr = load_params(GLARE_LPSR, lpsr_init(jax.random.PRNGKey(0), cfg))
    ev = OcrEvaluator(model, params, lpsr, names=ck.names, ocr_conf=0.5)
    rep = ev.evaluate_folder(REAL_PLATES2, batch_size=8)
    assert rep.n == 5
    assert rep.acc_sr >= 0.2          # >= 1/5 exact with SR (measured 2/5)
    assert rep.acc_sr > rep.acc_raw   # raw exact-match is 0 on these
    assert rep.cer_sr <= 0.35         # measured 0.275
    assert rep.cer_sr < rep.cer_raw   # SR strictly reduces CER (0.4 raw)
