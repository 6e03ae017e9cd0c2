"""BLADE-TPU convert subpackage."""
