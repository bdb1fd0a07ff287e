"""Single-evaluation binding for expensive column expressions.

Catalyst's CollapseProject / PushDownPredicates inline derived columns
into every textual reference — including into HOF lambda BODIES, where
the inlined expression re-evaluates PER ARRAY ELEMENT (HOFs are
CodegenFallback, so no common-subexpression elimination applies). The
r14 audit found whole regex splits and dot-product folds re-running
per element / per join-condition reference that way.

``bind1`` pins one evaluation without materialization: the input is
wrapped as a one-element array and handed to the lambda as a BOUND
VARIABLE, which Catalyst cannot substitute through. Same value, same
op order — only the evaluation count changes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind1(c: Column, f: Callable[[Column], Column]) -> Column:
    """``f(c)`` with ``c`` evaluated exactly once per row, however many
    times ``f``'s body references its argument."""
    return F.element_at(F.transform(F.array(c), f), 1)
