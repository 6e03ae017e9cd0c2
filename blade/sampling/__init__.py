"""BLADE-TPU sampling subpackage."""
