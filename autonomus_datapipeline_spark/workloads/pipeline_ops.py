"""Training-data pipeline operator queries (dedup / similarity / text /
multimodal) — populated in workloads batch 2."""

from __future__ import annotations
