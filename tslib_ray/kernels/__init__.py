"""Pure-numpy kernels (no Ray imports). Each function documents the reference
behavior it matches (``/root/reference/<file>:<lines>``); these run *inside*
per-group Arrow UDFs / actor-pool stages, never as driver-side loops."""
