"""Policy models: frame encoders and the sequence-head policy network.

Capability parity with the reference policies (``train_with_env.py:39-166``,
``train_with_env_com_trunc_advantage_ttt.py:42-53``, ``layers/
center_of_mass.py:4-60``) re-expressed in flax.linen: explicit parameter
pytrees, explicit recurrent carries (so rollouts are ``lax.scan``-able), and
explicit dropout PRNG keys.
"""

from .com import center_of_mass_2d
from .encoders import CNNEncoder, COMEncoder
from .init import torch_default_init
from .policy import PolicyNet, initial_carry

__all__ = [
    "center_of_mass_2d",
    "CNNEncoder",
    "COMEncoder",
    "PolicyNet",
    "initial_carry",
    "torch_default_init",
]
