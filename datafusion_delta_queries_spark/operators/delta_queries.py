"""Delta (IVM) queries — filled in with the plans/ IR compilers.

Placeholder during skeleton bring-up; see plans/ for the IR.
"""

from __future__ import annotations


def queries_and_oracles():
    return {}, {}
