# Eager-mode shim for the same-budget encoder match: the reference calls
# torch.compile(fullgraph=True) unconditionally on torch>=2.5, and with
# TORCH_COMPILE_DISABLE=1 the compiled wrapper raises "found no compiled
# frames" instead of falling back. Neutralize torch.compile to identity so
# the encoder runs pure eager (fair: the budget comparison is
# iteration-based, not wall-clock).
try:
    import torch

    def _no_compile(model=None, **kwargs):
        if model is None:
            return lambda f: f
        return model

    torch.compile = _no_compile
except Exception:
    pass
