"""BLADE-TPU cli subpackage."""
