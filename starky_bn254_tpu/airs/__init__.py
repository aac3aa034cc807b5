"""BN254 AIRs: Fq mul, Fq/Fq12/G1/G2 exponentiation state machines."""
