"""Relational + analytic operators (admission filter, windows, KDE,
clustering, dedup, similarity, text stats, retention)."""
