"""Registry-wide physical-plan audit (scale-shape tripwires).

Correctness gates (tools/verify_oracle.py) prove every query returns
the oracle's rows; this module pins that each plan would also SURVIVE
scale — the three structural anti-patterns that are invisible at
sf0.01 and fatal at 100 TB:

- ``unpartitioned-window``: a window function with no PARTITION BY
  serializes its whole input through ONE task. The sanctioned
  exception is the ``_pid`` totals pass of the two-pass prefix-sum
  machinery (textops.attach_rank) — one row PER PARTITION, bounded by
  cluster size, the intended k-row funnel.
- ``cartesian``: CartesianProduct = |left| x |right| with both sides
  shuffled; even a "small" side explodes. Deliberate query-panel x
  corpus scorers must broadcast the bounded side instead
  (BroadcastNestedLoopJoin — allowed).
- ``rowwise-python``: BatchEvalPython is the row-at-a-time Python UDF
  path (pickle per row); every kernel here is Arrow-batched
  (ArrowEvalPython / mapInPandas — allowed).

``audit_plan`` works on the explain(formatted) text so it composes
with the existing plan-pin helpers; ``audit_registry`` sweeps every
driver-contract query and returns {name: [violations]} for the
pinned sweep test and the per-round verify artifact.
"""

from __future__ import annotations

import re

from . import explain

# Window partition spec prefixes that are sanctioned by design (the
# one-row-per-partition totals pass of the prefix-sum machinery).
SANCTIONED_WINDOW_PREFIXES = ("_pid",)


def unpartitioned_windows(plan: str) -> list[str]:
    """Window specs whose FIRST argument is already a sort spec —
    i.e. no partition columns. ``windowspecdefinition(part..., col
    ASC ..., frame)``: with no partitioning the first token carries
    an ASC/DESC marker."""
    return [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
        if re.search(r"\s(ASC|DESC)\b", m.group(1))
        and not m.group(1).startswith(SANCTIONED_WINDOW_PREFIXES)
    ]


def audit_plan(plan: str) -> list[str]:
    """Violation tags found in one explain(formatted) text."""
    out = []
    for spec in unpartitioned_windows(plan):
        out.append(f"unpartitioned-window({spec.strip()})")
    if re.search(r"^\(\d+\) CartesianProduct\b", plan, re.MULTILINE):
        out.append("cartesian")
    if re.search(r"^\(\d+\) BatchEvalPython\b", plan, re.MULTILINE):
        out.append("rowwise-python")
    return out


def audit_df(df) -> list[str]:
    return audit_plan(explain.formatted_plan(df))


def audit_registry(
    spark,
    sf_dir: str,
    names: list[str] | None = None,
    on_error: str = "record",
) -> dict[str, list[str]]:
    """Build every registered query's DataFrame and audit its plan.

    Returns only the entries with violations (or build errors when
    ``on_error='record'``, tagged ``build-error: ...``). Building a
    query MAY run eager work (staged fixtures, bounded collects) —
    that is the query's real construction path, exactly what the
    driver runs.
    """
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}
    bad: dict[str, list[str]] = {}
    for name, fn in qs.items():
        try:
            violations = audit_df(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - build failures
            if on_error == "raise":
                raise
            violations = [f"build-error: {type(e).__name__}: {e}"]
        if violations:
            bad[name] = violations
    return bad
