"""Render docs/figures/stagewise_crossover.png from STAGEWISE.json.

A paired-dot (dumbbell) chart: one row per measured (plant, horizon,
batch) shape, condensed vs stage-wise(auto) throughput on a log axis —
the committed picture of the engine crossover (DESIGN.md §11).

Data provenance: condensed rates and the condensed-routed stage-wise
rates come from the round-4 ladder (`rows`); the stage-wise rates of
sw-routed shapes come from the refreshed `auto_rows` (which include the
round-5 streamed kernel). Both are gated interleaved measurements.

Run: python tools/plot_stagewise_crossover.py
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# validated reference palette (dataviz skill, categorical slots 1-2)
C_COND = "#2a78d6"  # blue: condensed engine
C_SW = "#eb6834"  # orange: stage-wise engine (auto executor)
INK = "#1a1a19"
INK_2 = "#595959"
GRID = "#e3e2d9"


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = json.loads((ROOT / "STAGEWISE.json").read_text())
    rows = {(r["n_cells"], r["N"], r["batch"]): r for r in d["rows"]}
    autos = {(r["n_cells"], r["N"], r["batch"]): r for r in d["auto_rows"]}

    shapes = sorted(rows, key=lambda k: (k[0], k[1], k[2]))
    labels, cond, sw = [], [], []
    for key in shapes:
        r, a = rows[key], autos.get(key)
        c_rate = r["condensed_solves_per_sec"]
        s_rate = (
            a["auto_solves_per_sec"]
            if a and a["auto_choice"] == "sw"
            else r["stagewise_solves_per_sec"]
        )
        n, N, B = key
        labels.append(f"n={n}  N={N}  B={B}")
        cond.append(c_rate)
        sw.append(s_rate)

    fig, ax = plt.subplots(figsize=(7.6, 4.6), dpi=160)
    ys = range(len(shapes))
    for y, (c, s) in enumerate(zip(cond, sw)):
        ax.plot([c, s], [y, y], color=GRID, lw=2, zorder=1)
        win = s >= c
        ratio = s / c if win else c / s
        ax.annotate(
            f"{'stage-wise' if win else 'condensed'} {ratio:.1f}x",
            xy=(max(c, s), y), xytext=(6, 0),
            textcoords="offset points", va="center", fontsize=8,
            color=INK_2,
        )
    ax.scatter(cond, list(ys), s=42, color=C_COND, zorder=3,
               label="condensed engine")
    ax.scatter(sw, list(ys), s=42, color=C_SW, zorder=3,
               label="stage-wise engine (auto executor)")
    ax.set_xscale("log")
    ax.set_yticks(list(ys))
    ax.set_yticklabels(labels, fontsize=8.5, color=INK)
    ax.set_xlabel("throughput, solves/s (log scale)", fontsize=9,
                  color=INK)
    ax.set_title(
        "Condensed vs stage-wise GPAD across the measured ladder\n"
        "(battery plants; gated interleaved chip A/B, STAGEWISE.json)",
        fontsize=10, color=INK, loc="left",
    )
    ax.tick_params(colors=INK_2, labelsize=8)
    ax.grid(axis="x", color=GRID, lw=0.8)
    ax.set_axisbelow(True)
    for side in ("top", "right", "left"):
        ax.spines[side].set_visible(False)
    ax.spines["bottom"].set_color(GRID)
    ax.set_xlim(8e2, 2e7)
    ax.invert_yaxis()
    ax.legend(loc="lower right", frameon=False, fontsize=8.5)
    fig.tight_layout()
    out = ROOT / "docs" / "figures" / "stagewise_crossover.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
