"""BLADE-TPU schedulers subpackage."""
