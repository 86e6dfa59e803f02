"""Declared schemas for every engine table (SURVEY §1).

Three groups:
- ``payloads``  — StructTypes used by ``from_json`` over raw JSON payloads
                  (fork superset: later-fork fields null on earlier forks)
- ``raw``       — raw (Load-stage) table schemas
- ``structured``— structured (Transform-stage) analytic table schemas
"""
