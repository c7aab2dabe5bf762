"""Guard: no operator module rebinds a module-level ALL_CAPS constant.

Regression pin for the docs_shard_packing incident (round 8): a later
section of curation.py introduced a second ``TOKEN_BUDGET = 8_000``,
silently rebinding the ``TOKEN_BUDGET = 20_000`` that
``_q_shard_packing`` reads at call time — while the SHARD_DUCK oracle
had already baked the old literal in at import. The Spark/oracle
split only surfaced in the next full-mirror verify run. Python makes
this class of drift silent; this test makes it loud.

Scope: top-level ``NAME = ...`` statements (ast.Assign / AnnAssign at
module body depth) where NAME is ALL_CAPS. Augmented assignment and
conditional try/except fallbacks (which appear at nested depth) are
out of scope by construction.
"""
from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "dataset_batch_processor_spark"
)


def _toplevel_constant_names(tree: ast.Module) -> list[str]:
    names: list[str] = []
    for node in tree.body:
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Name) and t.id.isupper():
                names.append(t.id)
    return names


def test_no_module_rebinds_allcaps_constant():
    offenders: list[str] = []
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        names = _toplevel_constant_names(tree)
        dups = sorted({n for n in names if names.count(n) > 1})
        if dups:
            offenders.append(f"{py.relative_to(PKG.parent)}: {dups}")
    assert not offenders, (
        "module-level ALL_CAPS constants rebound (each name must be "
        "assigned once per module — a later assignment silently wins "
        "for call-time readers while import-time f-string oracles keep "
        "the old value):\n" + "\n".join(offenders)
    )
