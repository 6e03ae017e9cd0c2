"""BLADE-TPU utils subpackage."""
