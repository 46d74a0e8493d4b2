"""Measurement and probe tools (importable so bench.py can reuse the
gallery/training helpers in bench_embed_pipeline / bench_decode_realistic)."""
