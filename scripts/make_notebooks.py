#!/usr/bin/env python3
"""Render the runnable examples into executed Jupyter notebooks.

The reference teaches through 7 .ipynb notebooks (``/root/reference/
notebooks/``); this repo's source of truth is the ``examples/*.py`` scripts
(testable, diffable). This tool derives ``notebooks/NN_*.ipynb`` from them:
the module docstring becomes the title cell, top-level blank-line paragraphs
become code cells, and the notebook is EXECUTED (nbclient) so rendered
outputs ship in-repo like the reference's.

    python scripts/make_notebooks.py            # convert + execute all
    python scripts/make_notebooks.py --no-run   # convert only
    python scripts/make_notebooks.py 01 03      # subset by number prefix
"""
from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
EXAMPLES = REPO / "examples"
NOTEBOOKS = REPO / "notebooks"

def split_cells(source: str):
    """(docstring, [code cells]): top-level blank-line paragraphs → cells."""
    lines = source.splitlines()
    if lines and lines[0].startswith("#!"):
        lines = lines[1:]
    body = "\n".join(lines)

    doc = ""
    match = re.match(r'\s*(?:"""|\'\'\')(.*?)(?:"""|\'\'\')\s*\n', body,
                     re.DOTALL)
    if match:
        doc = match.group(1).strip()
        body = body[match.end():]

    cells, current = [], []
    for line in body.splitlines():
        starts_paragraph = (current and current[-1] == ""
                            and line and not line[0].isspace()
                            and not line.startswith((")", "]", "}")))
        if starts_paragraph:
            chunk = "\n".join(current).strip()
            if chunk:
                cells.append(chunk)
            current = []
        current.append(line)
    tail = "\n".join(current).strip()
    if tail:
        cells.append(tail)
    return doc, cells


def to_notebook(py_path: Path):
    import nbformat as nbf

    doc, cells = split_cells(py_path.read_text())
    nb = nbf.v4.new_notebook()
    title = py_path.stem.split("_", 1)[1].replace("_", " ").title()
    nb.cells.append(nbf.v4.new_markdown_cell(f"# {title}\n\n{doc}"))
    # kernels don't define __file__; the scripts use it for the repo-root
    # sys.path shim and for sibling output filenames
    nb.cells.append(nbf.v4.new_code_cell(
        "import pathlib\n"
        f'__file__ = str(pathlib.Path.cwd() / "{py_path.name}")'))
    nb.cells.extend(nbf.v4.new_code_cell(c) for c in cells)
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    return nb


def main(argv=None):
    import nbformat as nbf

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prefixes", nargs="*",
                    help="only scripts whose name starts with these")
    ap.add_argument("--no-run", action="store_true",
                    help="skip execution (cells ship without outputs)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-cell execution timeout (s)")
    ns = ap.parse_args(argv)

    NOTEBOOKS.mkdir(exist_ok=True)
    scripts = sorted(EXAMPLES.glob("[0-9]*.py"))
    if ns.prefixes:
        scripts = [s for s in scripts
                   if any(s.name.startswith(p) for p in ns.prefixes)]
    for script in scripts:
        nb = to_notebook(script)
        out = NOTEBOOKS / (script.stem + ".ipynb")
        if not ns.no_run:
            from nbclient import NotebookClient

            print(f"executing {script.name} ...", flush=True)
            client = NotebookClient(
                nb, timeout=ns.timeout, kernel_name="python3",
                resources={"metadata": {"path": str(NOTEBOOKS)}})
            client.execute()
        nbf.write(nb, out)
        n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
        print(f"wrote {out.relative_to(REPO)} "
              f"({len(nb.cells)} cells, {n_out} outputs)")


if __name__ == "__main__":
    main()
