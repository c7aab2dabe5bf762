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


def _first_toplevel_arg(plan: str, start: int) -> str:
    """Text from ``start`` up to the first comma or close-paren at
    paren depth 0 — the windowspecdefinition's first argument even
    when it is itself a parenthesized expression like
    ``cast(x#1 as bigint) ASC NULLS FIRST`` (ADVICE r14: the old
    ``[^,)]*`` regex truncated at the cast's ')' and silently dropped
    the ASC/DESC marker, a false negative in the gate)."""
    depth = 0
    i = start
    while i < len(plan):
        c = plan[i]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif c == "," and depth == 0:
            break
        i += 1
    return plan[start:i]


def unpartitioned_windows(plan: str) -> list[str]:
    """Window specs whose FIRST argument is already a sort spec —
    i.e. no partition columns. ``windowspecdefinition(part..., col
    ASC ..., frame)``: with no partitioning the first argument
    carries an ASC/DESC marker. The first argument is extracted with
    a paren-depth scan, not a regex, so parenthesized ORDER BY
    expressions cannot hide the marker."""
    return [
        arg
        for m in re.finditer(r"windowspecdefinition\(", plan)
        for arg in (_first_toplevel_arg(plan, m.end()),)
        if re.search(r"\s(ASC|DESC)\b", arg)
        and not arg.startswith(SANCTIONED_WINDOW_PREFIXES)
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
