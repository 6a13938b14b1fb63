"""Summarize runs/convergence/report.json into the judge-facing quality table:
one row per metric block (keypoint level, AE recon, cloud level, FastDPM S=*),
with the separability headline (1-NN-CD acc / acc_f) and EMD columns when
present, plus per-category 1-NN-CD.  Pure host-side JSON formatting — never
touches the chip."""

import json
import os
import sys

KEYS = ["1-NN-CD-acc", "1-NN-CD-acc_f", "1-NN-CD-acc_t", "1-NN-EMD-acc",
        "COV-CD", "MMD-CD", "COV-EMD", "MMD-EMD", "JSD", "mean_cd_p",
        "suite_wall_s"]


def row(name, m):
    vals = {k: m[k] for k in KEYS if k in m}
    return name, vals


def main(path):
    with open(path) as f:
        rep = json.load(f)
    print(f"# {path}")
    for name in ("keypoint_level", "ae_recon", "cloud_level",
                 "fastdpm_s100", "fastdpm_s50"):
        if name not in rep:
            continue
        _, vals = row(name, rep[name])
        print(f"\n## {name}")
        for k, v in vals.items():
            print(f"  {k:18s} {v:.4f}" if isinstance(v, float) else
                  f"  {k:18s} {v}")
        pc = rep[name].get("per_category")
        if pc:
            print("  per-category 1-NN-CD acc:")
            for cat, m in pc.items():
                acc = m.get("1-NN-CD-acc")
                n = m.get("n")
                print(f"    {cat}: {acc:.4f} (n={n})" if acc is not None
                      else f"    {cat}: {m}")
    extra = [k for k in rep if k not in ("keypoint_level", "ae_recon",
                                         "cloud_level", "fastdpm_s100",
                                         "fastdpm_s50")]
    if extra:
        print("\n(other blocks:", ", ".join(extra) + ")")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "runs", "convergence", "report.json"))
