"""BLADE-TPU parallel subpackage."""
