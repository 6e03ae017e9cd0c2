"""BLADE-TPU attention subpackage."""
