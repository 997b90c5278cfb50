"""Load the reference implementation as an in-process oracle.

The reference (read-only at /root/reference) depends on numba only for
speed — its kernels are semantically plain numpy loops. Installing a fake
`numba` module whose njit is a no-op lets the *actual reference engine*
run (slowly) on small problems, giving an executable oracle for
trajectory-level parity tests. pandas>=2 API changes are shimmed the same
way. Nothing from the reference is copied; it is imported from its own
tree.
"""
import sys
import types

import numpy as np
import pandas as pd

REF_SRC = '/root/reference/src'


def install():
    """Install shims and import the reference `vilma` package."""
    if 'vilma' in sys.modules:
        import vilma
        return vilma

    # fake numba: njit(signature, ...) -> identity decorator; prange=range
    fake = types.ModuleType('numba')

    def njit(*args, **kwargs):
        def deco(fn):
            return fn
        if args and callable(args[0]):
            return args[0]
        return deco

    fake.njit = njit
    fake.prange = range
    sys.modules['numba'] = fake

    # pandas shims: delim_whitespace kwarg and writable to_numpy
    if not getattr(pd.read_csv, '_vilma_shim', False):
        orig_read_csv = pd.read_csv

        def read_csv(*args, **kwargs):
            if kwargs.pop('delim_whitespace', False):
                kwargs['sep'] = r'\s+'
            return orig_read_csv(*args, **kwargs)

        read_csv._vilma_shim = True
        pd.read_csv = read_csv

        orig_series_tnp = pd.Series.to_numpy
        pd.Series.to_numpy = (
            lambda self, *a, **k: np.array(orig_series_tnp(self, *a, **k)))
        orig_frame_tnp = pd.DataFrame.to_numpy
        pd.DataFrame.to_numpy = (
            lambda self, *a, **k: np.array(orig_frame_tnp(self, *a, **k)))

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import vilma
    import vilma.load            # noqa: F401
    import vilma.sim             # noqa: F401
    import vilma.matrix_structures   # noqa: F401
    import vilma.variational_inference  # noqa: F401
    return vilma
