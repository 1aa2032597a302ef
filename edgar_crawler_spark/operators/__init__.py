"""Relational + training-data-pipeline operators, all expressed as
DataFrame transformations (Catalyst-optimizable; UDFs only where
semantics genuinely require Python)."""
