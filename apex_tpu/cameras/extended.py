"""Extended camera models (placeholder module — models added here
self-register). RadTan/Kannala-Brandt/FOV/UCM/EUCM/DoubleSphere/FTheta land
in this module as they are implemented."""
