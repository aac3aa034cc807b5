"""AIR building blocks: limb algebra, modular reduction, range checks,
lookups, pulses, exponent-bit flags, equality gadgets."""
