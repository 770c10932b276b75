"""Quantify the uniform-set accuracy-delta gap (VERDICT.md round-4 weak #3).

The unified checkpoint reaches +10.48 pts exact-match on the
uniform-difficulty protocol set vs the reference's published +19.71 (which
this repo *exceeds* on the difficulty-calibrated r3c set: +21.90).  Round 4
argued in prose that uniform difficulty spreads residual errors across
plates; this tool turns that into measured numbers from per-plate error
distributions (``lpr_tpu.cli.evaluate --per-image`` dumps):

- per-plate char-error histograms and the dispersion index
  (var/mean; Poisson scatter = 1, clustered damage > 1);
- the **clustering factor** C = exact_acc / (1 - CER)^L̄ — how much more
  often plates are perfectly read than independent per-char errors would
  allow.  From the reference's published aggregates: C_raw = 5.33,
  C_sr = 1.39 (README.md:244 numbers);
- the **requirement frontier** for the published +19.71 on the uniform
  set: the SR CER needed at the measured clustering, and the clustering
  needed at the measured SR CER — i.e. exactly what would have to change
  for the uniform set to show the published delta.

Output: EVAL_r5/uniform_gap_analysis.json + a markdown-ish stdout summary.

Usage (after the per-image evals exist):
  python tools/analyze_uniform_gap.py \
      --uniform EVAL_r5/unified_uniform_perimage.json \
      --r3c EVAL_r5/unified_r3c_perimage.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lpr_tpu.eval.harness import levenshtein

# reference README.md:240-245 (1050 real LR crops)
PUB = {"acc_raw": 0.2686, "acc_sr": 0.4657,
       "cer_raw": 0.3110, "cer_sr": 0.1281}
PUB_DELTA = PUB["acc_sr"] - PUB["acc_raw"]


def per_plate_errors(per_image, key):
    errs, lens = [], []
    for r in per_image:
        errs.append(levenshtein(r["gt"], r[key]))
        lens.append(len(r["gt"]))
    return np.asarray(errs), np.asarray(lens)


def path_stats(per_image, key):
    errs, lens = per_plate_errors(per_image, key)
    n = len(errs)
    cer = float((errs / np.maximum(lens, 1)).mean())
    acc = float((errs == 0).mean())
    lbar = float(lens.mean())
    p_iid = (1.0 - cer) ** lbar
    mean_e = errs.mean()
    disp = float(errs.var() / mean_e) if mean_e > 0 else 0.0
    hist = np.bincount(np.minimum(errs, 9), minlength=10).tolist()
    return {
        "n": n, "acc": acc, "cer": cer, "mean_len": lbar,
        "p_iid_exact": float(p_iid),
        "clustering_C": float(acc / p_iid) if p_iid > 0 else float("inf"),
        "dispersion_var_over_mean": disp,
        "err_hist_0to9plus": hist,
        "frac_err_plates_with_1_err": float(
            (errs == 1).sum() / max((errs > 0).sum(), 1)),
    }


def required_frontier(acc_raw, sr, lbar):
    """What must change for acc_raw + PUB_DELTA to be reached."""
    target = acc_raw + PUB_DELTA
    out = {"target_acc_sr": target}
    # CER needed at measured clustering: target = C * (1-p)^lbar
    c = sr["clustering_C"]
    if 0 < target / c < 1:
        out["required_cer_at_measured_C"] = float(
            1.0 - (target / c) ** (1.0 / lbar))
    # clustering needed at measured CER: target = C' * (1-cer)^lbar
    out["required_C_at_measured_cer"] = float(
        target / (1.0 - sr["cer"]) ** lbar)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniform", default="EVAL_r5/unified_uniform_perimage.json")
    ap.add_argument("--r3c", default="EVAL_r5/unified_r3c_perimage.json")
    ap.add_argument("--out", default="EVAL_r5/uniform_gap_analysis.json")
    args = ap.parse_args(argv)

    result = {"published": dict(PUB, delta_acc=PUB_DELTA,
                                C_raw=PUB["acc_raw"] / (1 - PUB["cer_raw"]) ** 8,
                                C_sr=PUB["acc_sr"] / (1 - PUB["cer_sr"]) ** 8)}
    for name, path in [("uniform", args.uniform), ("r3c", args.r3c)]:
        with open(path) as f:
            d = json.load(f)
        pi = d["per_image"]
        raw = path_stats(pi, "raw")
        sr = path_stats(pi, "sr")
        entry = {
            "raw": raw, "sr": sr,
            "delta_acc": sr["acc"] - raw["acc"],
            "delta_cer": sr["cer"] - raw["cer"],
        }
        entry["frontier"] = required_frontier(raw["acc"], sr,
                                              sr["mean_len"])
        result[name] = entry

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)

    p = result["published"]
    print(f"published:  delta +{PUB_DELTA*100:.2f} pts  "
          f"C_raw {p['C_raw']:.2f}  C_sr {p['C_sr']:.2f}")
    for name in ("uniform", "r3c"):
        e = result[name]
        fr = e["frontier"]
        print(f"\n[{name}] delta {e['delta_acc']*100:+.2f} pts  "
              f"(raw acc {e['raw']['acc']*100:.2f} cer {e['raw']['cer']*100:.2f} | "
              f"sr acc {e['sr']['acc']*100:.2f} cer {e['sr']['cer']*100:.2f})")
        print(f"  raw: C {e['raw']['clustering_C']:.2f}  dispersion "
              f"{e['raw']['dispersion_var_over_mean']:.2f}  "
              f"hist {e['raw']['err_hist_0to9plus']}")
        print(f"  sr : C {e['sr']['clustering_C']:.2f}  dispersion "
              f"{e['sr']['dispersion_var_over_mean']:.2f}  "
              f"hist {e['sr']['err_hist_0to9plus']}  "
              f"1-err share {e['sr']['frac_err_plates_with_1_err']*100:.0f}%")
        req_cer = fr.get("required_cer_at_measured_C")
        print(f"  to reach published +{PUB_DELTA*100:.2f} here: "
              f"SR CER <= {req_cer*100:.2f}% at measured clustering, or "
              f"clustering C >= {fr['required_C_at_measured_cer']:.2f} at "
              f"measured CER" if req_cer is not None else
              f"  target acc {fr['target_acc_sr']*100:.1f}% unreachable at "
              f"measured clustering (needs C > measured)")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
