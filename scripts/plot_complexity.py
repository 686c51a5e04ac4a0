"""Model complexity comparison plot — equivalent of
`TrainTestGSASR/scripts/plot/model_complexity_cmp_bsrn.py`.

The reference script hardcodes one figure (params-vs-PSNR bubble scatter
with FLOPs-scaled markers). Ours generalizes it: models come from a JSON
spec so any comparison can be plotted.

JSON spec: a list of {"name": str, "params_k": float, "psnr": float,
"flops_g": float, "group": int} entries. Example:

  python scripts/plot_complexity.py --spec models.json --out cmp.png
"""

import argparse
import json


GROUP_COLORS = ["#4D96FF", "#FFD93D", "#95CD41", "#FF6B6B", "#B983FF"]


def plot(spec, out, xlabel="Params (K)", ylabel="PSNR (dB)",
         title="Model complexity comparison"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(15, 10))
    radius = 9.5
    for m in spec:
        g = int(m.get("group", 0)) % len(GROUP_COLORS)
        area = max(m.get("flops_g", 30.0), 1.0) * radius ** 2
        ax.scatter([m["params_k"]], [m["psnr"]], s=area, alpha=0.8,
                   marker=".", c=GROUP_COLORS[g], edgecolors="white",
                   linewidths=2.0)
        ax.annotate(m["name"], (m["params_k"], m["psnr"] + 0.1),
                    fontsize=18, ha="center")
    ax.set_xlabel(xlabel, fontsize=22)
    ax.set_ylabel(ylabel, fontsize=22)
    ax.set_title(title, fontsize=24)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True, help="JSON list of models")
    ap.add_argument("--out", default="complexity.png")
    ap.add_argument("--xlabel", default="Params (K)")
    ap.add_argument("--ylabel", default="PSNR (dB)")
    args = ap.parse_args()
    with open(args.spec) as f:
        spec = json.load(f)
    print(plot(spec, args.out, args.xlabel, args.ylabel))


if __name__ == "__main__":
    main()
