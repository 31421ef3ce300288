"""THE corpus tokenization contract, defined once.

Every operator family that tokenizes document text (dedup shingles,
text analysis, TF-IDF, vocab construction) must agree on one
tokenization, or their outputs stop composing — a doc's shingles, its
token counts and its vocab contributions would describe different token
streams. The contract is deliberately minimal (whitespace split of the
lowercased text; SURVEY §2.C's "whitespace + BPE-ish regex" baseline)
and engine-mirrored: the DuckDB oracle twin is
``string_split(lower(text), ' ')``.

Token-COUNT sites that deliberately skip lowercasing (case changes no
token boundaries, e.g. text_pack_sequences' budget counter) stay inline
— this module is the contract for token IDENTITY.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens of ``col`` as an array column."""
    return F.split(F.lower(F.col(col)), " ")
