"""Solver modules — one per reference program (SURVEY.md §2 inventory).

Each module exposes a frozen Config dataclass, `init(cfg) -> state`,
`step(cfg, state) -> state` (pure, jittable), and render-value helpers.
"""
