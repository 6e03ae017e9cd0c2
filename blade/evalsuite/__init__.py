"""Evaluation suite: VBench-style sampling + score aggregation."""
