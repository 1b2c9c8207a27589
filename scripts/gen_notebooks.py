"""Generate docs/examples/*.ipynb from examples/*.py.

The reference documents itself through executable notebooks
(docs/examples/*.ipynb); this repo's runnable examples are plain python
(CI runs them), and this script wraps each one as a notebook — module
docstring as a markdown cell, code split into cells on blank-line
boundaries between top-level statements — so notebook-first users get the
same entry points.

Usage: python scripts/gen_notebooks.py
"""

import json
import pathlib


def to_notebook(src: str, title: str):
    lines = src.splitlines()
    # split docstring
    doc = []
    body_start = 0
    if lines and lines[0].startswith('"""'):
        first = lines[0][3:]
        if first.endswith('"""') and len(lines[0]) > 6:
            doc, body_start = [first[:-3]], 1
        else:
            doc = [first] if first else []
            for i, ln in enumerate(lines[1:], start=1):
                if ln.rstrip().endswith('"""'):
                    doc.append(ln.rstrip()[:-3])
                    body_start = i + 1
                    break
                doc.append(ln)
    body = "\n".join(lines[body_start:]).strip("\n")

    # split body into cells at double blank lines
    chunks = [c.strip("\n") for c in body.split("\n\n\n") if c.strip()]

    def md_cell(text):
        return {"cell_type": "markdown", "metadata": {},
                "source": text.splitlines(keepends=True)}

    def code_cell(text):
        return {"cell_type": "code", "metadata": {}, "execution_count": None,
                "outputs": [], "source": text.splitlines(keepends=True)}

    cells = [md_cell(f"# {title}\n\n" + "\n".join(doc).strip())]
    cells += [code_cell(c) for c in chunks]
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


TITLES = {
    "windspeed_retrieval": "Wind speed retrieval (dual-pol, end to end)",
    "detrend_roughness": "Sigma0 detrend (roughness / nice display)",
    "streaks_direction": "Wind-streak direction from multi-scale gradients",
    "gmfs_and_luts": "GMFs, LUTs and custom model registration",
    "multichip_batch": "Multi-scene batch inversion over a device mesh",
    "out_of_core_scene": "Out-of-core scenes: streamed inversion and streaks",
    "create_hh_lut": "Create HH LUTs from VV models and polarization ratios",
}


def main():
    root = pathlib.Path(__file__).resolve().parents[1]
    outdir = root / "docs" / "examples"
    outdir.mkdir(parents=True, exist_ok=True)
    for py in sorted((root / "examples").glob("*.py")):
        nb = to_notebook(py.read_text(), TITLES.get(py.stem, py.stem))
        out = outdir / (py.stem + ".ipynb")
        out.write_text(json.dumps(nb, indent=1))
        print("wrote", out)


if __name__ == "__main__":
    main()
