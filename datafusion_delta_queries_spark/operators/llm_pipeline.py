"""LLM-data-pipeline operators — filled in with functions/ modules.

Placeholder during skeleton bring-up.
"""

from __future__ import annotations


def queries_and_oracles():
    return {}, {}
