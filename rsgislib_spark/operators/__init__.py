"""Distributed operators: each re-expresses a reference capability
(SURVEY.md §2) as DataFrame transformations with explicit partitioning
strategy, scaling to 10^12-row inputs."""
