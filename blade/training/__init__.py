"""BLADE-TPU training subpackage."""
