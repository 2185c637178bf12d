"""Relational analytics plans over the star schema."""
