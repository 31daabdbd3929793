"""Relational operator surface (SURVEY.md §2.2 derived + §2.3 gap table).

``relational``: projection/filter, aggregations, joins (equi/semi/anti/outer/
range), windows, set ops, rollup/cube/grouping-sets, top-k, pivot.
``events``: event-time windowing (tumbling/sliding), sessionization, JSON
property extraction.
"""
