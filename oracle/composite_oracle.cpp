// Placeholder translation unit; composite/delta-sigma oracle lands with
// the signal-synthesis milestone.
extern "C" int composite_oracle_present(void) { return 0; }
