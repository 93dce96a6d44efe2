"""Generate executable .ipynb tutorials from docs/tutorials/*.md.

The reference ships runnable notebooks (``/root/reference/tutorials/``,
4 .ipynb); the narrated markdown tutorials here carry the same content as
prose + fenced python blocks. This tool converts each markdown tutorial
into a notebook (prose → markdown cells, ``` ```python``` fences → code
cells) and, with ``--execute``, runs each notebook end to end on the CPU
backend to prove it is executable (cells tagged via a leading
``# not-executable`` comment line are rendered as markdown instead).

Run:  python scripts/dev/gen_notebooks.py [--execute] [names...]
"""

import re
import sys
from pathlib import Path

import nbformat

ROOT = Path(__file__).resolve().parents[2]
SRC = ROOT / "docs" / "tutorials"
DST = ROOT / "tutorials"

HEADER_CELL = """\
# Environment setup for this repository checkout: run from anywhere.
import os, sys
sys.path.insert(0, {root!r})
# Tutorials execute on the CPU backend by default so they run everywhere;
# on a TPU host, delete the next four lines to run on hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax
jax.config.update("jax_platforms", "cpu")
"""


def md_to_notebook(md_path: Path) -> nbformat.NotebookNode:
    text = md_path.read_text()
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    cells = [nbformat.v4.new_code_cell(HEADER_CELL.format(root=str(ROOT)))]
    # Split on fenced python blocks; everything else is markdown.
    parts = re.split(r"```python\n(.*?)```", text, flags=re.S)
    for i, part in enumerate(parts):
        part = part.strip("\n")
        if not part.strip():
            continue
        if i % 2 == 1:  # code fence
            if part.lstrip().startswith("# not-executable"):
                cells.append(
                    nbformat.v4.new_markdown_cell(
                        "```python\n" + part + "\n```"
                    )
                )
            else:
                cells.append(nbformat.v4.new_code_cell(part))
        else:
            cells.append(nbformat.v4.new_markdown_cell(part))
    nb.cells = cells
    return nb


def main():
    execute = "--execute" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    DST.mkdir(exist_ok=True)
    for md_path in sorted(SRC.glob("*.md")):
        if names and md_path.stem not in names:
            continue
        nb = md_to_notebook(md_path)
        out = DST / f"{md_path.stem}.ipynb"
        if execute:
            from nbclient import NotebookClient

            print(f"executing {md_path.stem} ...", flush=True)
            client = NotebookClient(
                nb, timeout=1800, kernel_name="python3",
                resources={"metadata": {"path": str(ROOT)}},
            )
            client.execute()
        nbformat.write(nb, out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
