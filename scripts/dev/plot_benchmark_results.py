"""Plot world-count sweep results against the reference's GPU baselines.

The analog of the reference's ``scripts/dev/plot_benchmark_results.py``
(which merges per-GPU CSVs): reads one or more CSVs produced by
``flygym_tpu.demo.benchmark.run_benchmark(...).to_csv(...)`` and plots
realtime factor vs world count, with the reference's published GPU numbers
drawn as horizontal baselines (BASELINE.md: ~30x RTX 3080 Ti, ~60x
L40S/H100).

Usage:
    python scripts/dev/plot_benchmark_results.py results.csv [more.csv ...] \
        [-o out.png]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

REF_BASELINES = {  # realtime factor, BASELINE.md / reference tutorial 3
    "reference RTX 3080 Ti": 30.0,
    "reference L40S / H100": 60.0,
}


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.ticker as ticker
    import pandas as pd

    argv = sys.argv[1:]
    out = Path("outputs/benchmark_results.png")
    if "-o" in argv:
        i = argv.index("-o")
        out = Path(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if not argv:
        sys.exit(__doc__)
    out.parent.mkdir(parents=True, exist_ok=True)

    fig, ax = plt.subplots(figsize=(6, 4), tight_layout=True)
    for csv in argv:
        df = pd.read_csv(csv)
        label = Path(csv).stem
        ax.plot(
            df["n_worlds"], df["realtime_factor"], marker="o", label=label
        )
    for name, rtf in REF_BASELINES.items():
        ax.axhline(rtf, ls="--", lw=1, color="grey")
        ax.annotate(name, (ax.get_xlim()[0], rtf), fontsize=7, va="bottom")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.xaxis.set_major_formatter(ticker.ScalarFormatter())
    ax.set_xlabel("number of parallel worlds")
    ax.set_ylabel("aggregate realtime factor")
    ax.legend(fontsize=8)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
