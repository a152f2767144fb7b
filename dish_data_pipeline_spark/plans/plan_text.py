"""Structural parsing of a physical plan's ``toString`` tree.

Counting plan features by SUBSTRING ("Exchange" in plan) over-counts:
ReusedExchange nodes name their referent inline, AQE stage nodes
contain the word, and BroadcastExchange shares the suffix. These
helpers name the NODE on each tree line instead — tree art
(``:  +- `` etc), an optional whole-stage-codegen ``*(N)`` marker,
then the node class — and dedupe shuffle Exchanges by ``plan_id``,
so counts are the physical truth and survive toString format drift
across Spark versions. Used by the plan-budget tests and the
PLANS.md audit so both report the same numbers.
"""

from __future__ import annotations

import re

_NODE_RE = re.compile(r"^[\s:+|\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)")
_PLAN_ID_RE = re.compile(r"plan_id=(\d+)")


def final_plan(df) -> str:
    """Execute ``df`` and return the FINAL adaptive plan text (under
    AQE the pre-execution string is ``isFinalPlan=false`` with
    not-yet-final join strategies)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    return plan


def node_lines(plan: str, node: str) -> list[str]:
    """Tree lines whose node class name is exactly ``node``."""
    out = []
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if m and m.group(1) == node:
            out.append(line)
    return out


def count_shuffles(plan: str) -> int:
    """Physical shuffle Exchanges, deduped by plan_id so a reprinted
    subtree (ReusedExchange referents, AQE stage reprints) counts its
    exchange once."""
    keys = set()
    for i, line in enumerate(node_lines(plan, "Exchange")):
        m = _PLAN_ID_RE.search(line)
        keys.add(m.group(1) if m else f"line-{i}")
    return len(keys)


def count_broadcasts(plan: str) -> int:
    """Physical BroadcastExchanges, plan_id-deduped like shuffles."""
    keys = set()
    for i, line in enumerate(node_lines(plan, "BroadcastExchange")):
        m = _PLAN_ID_RE.search(line)
        keys.add(m.group(1) if m else f"line-{i}")
    return len(keys)
