"""BLADE-TPU models subpackage."""
