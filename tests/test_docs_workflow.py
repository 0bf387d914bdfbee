"""docs/workflow.md is executable documentation: every fenced python
block runs verbatim, in order, in one namespace (the analog of the
reference's R CMD check running the vignette's chunks,
vignettes/ccfindR.Rmd:122-477).  The blocks carry their own
assertions (ropt == 5, all five cell types recovered), so this test
both renders the figures and checks the scientific ground truth.

docs/api.md is generated documentation: it must match what
docs/gen_api.py produces for the current package.
"""

import os
import re
import subprocess
import sys

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def _code_blocks(path):
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_workflow_md_executes(tmp_path):
    blocks = _code_blocks(os.path.join(DOCS, "workflow.md"))
    assert len(blocks) >= 10, "workflow.md lost its code blocks"
    os.environ["CCFINDR_FIGDIR"] = str(tmp_path)
    ns = {}
    try:
        for i, block in enumerate(blocks):
            code = compile(block, f"workflow.md[block {i}]", "exec")
            exec(code, ns)          # noqa: S102 - our own docs
    finally:
        os.environ.pop("CCFINDR_FIGDIR", None)
    # the doc's own assertions passed; check the figures rendered
    for fig in ("filter_cells.png", "filter_genes.png",
                "ml_measure.png", "rank_scan.png", "feature_map.png",
                "cell_map.png", "tsne.png", "tree.png"):
        p = tmp_path / fig
        assert p.exists() and p.stat().st_size > 1000, fig


def test_api_md_in_sync():
    gen = subprocess.run(
        [sys.executable, os.path.join(DOCS, "gen_api.py"), "-"],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(DOCS, ".."))
    current = open(os.path.join(DOCS, "api.md")).read()
    assert gen.stdout == current, (
        "docs/api.md is stale - regenerate with: python docs/gen_api.py")
