"""Physical constants (SI) used across the sky/instrument model."""

H_PLANCK = 6.62607015e-34   # J s
K_BOLTZ = 1.380649e-23      # J / K
C_LIGHT = 2.99792458e8      # m / s
T_CMB = 2.7255              # K
GHZ = 1.0e9
