"""Spark-side operators: extraction, dedup, similarity, text stats."""
