"""Training-data pipeline operators: dedup, similarity, text, multimodal.

Populated incrementally; see operators/ for the implementation layer.
"""

from __future__ import annotations
