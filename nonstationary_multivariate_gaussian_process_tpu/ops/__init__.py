from . import chol, kernels, kron, transforms  # noqa: F401
