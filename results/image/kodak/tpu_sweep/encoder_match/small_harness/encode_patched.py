"""Runpy wrapper for the reference encoder with a minimal plumbing fix.

Upstream bug (this fork): enc/bitstream/armint.py ArmInt.forward indexes
`raw_proba_param[:, 0]` assuming a 2-D [B, C] input, but the batched
CoolChicEncoder.forward (enc/component/coolchic.py:405-420) feeds the ARM a
3-D [1, M, C] context, so EVERY bitstream write crashes in
get_ac_max_val_latent (`x - expectation` shape mismatch). The published
streams predate the batched-forward refactor. Fix: flatten [B, M, C] ->
[B*M, C] around the original forward; the fixed-point arithmetic is
untouched.
"""
import sys
import runpy


def _patch(mod):
    Arm = mod.ArmInt
    if getattr(Arm, "_ndim_patched", False):
        return
    orig = Arm.forward

    def fixed(self, x):
        if x.ndim == 3:
            b, m, c = x.shape
            mu, scale, log_scale = orig(self, x.reshape(b * m, c))
            return mu.view(b, m), scale.view(b, m), log_scale.view(b, m)
        return orig(self, x)

    Arm.forward = fixed
    Arm._ndim_patched = True


import enc.bitstream.armint as a1  # noqa: E402

_patch(a1)

# Second fork break: latents are wrapped in CoolChicLatentGrid modules, but
# the header writer still calls latent_i.size() (enc/bitstream/header.py:443).
# Delegate to the underlying parameter.
import enc.component.coolchic as cc1  # noqa: E402

cc1.CoolChicLatentGrid.size = lambda self, *a: self.data.size(*a)
try:
    import coolchic.enc.component.coolchic as cc2  # noqa: E402

    if cc2 is not cc1:
        cc2.CoolChicLatentGrid.size = lambda self, *a: self.data.size(*a)
except ImportError:
    pass
try:
    import coolchic.enc.bitstream.armint as a2  # noqa: E402

    if a2 is not a1:
        _patch(a2)
except ImportError:
    pass

runpy.run_path("/root/reference/coolchic/encode.py", run_name="__main__")
