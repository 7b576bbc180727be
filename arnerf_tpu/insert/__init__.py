"""AR object-insertion subsystem (TPU-native rebuild of reference insert/):
SH/SG lighting math, inverse rendering for global light, light probes, PBR
render cores, shadow fields, SG-SSDF shadows, environment-map SG fitting,
tonemapping, and the TCP viewer protocol."""
