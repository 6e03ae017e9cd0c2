"""BLADE-TPU kernels subpackage."""
