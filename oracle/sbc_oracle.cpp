// Placeholder translation unit; SBC oracle lands with the audio milestone.
extern "C" int sbc_oracle_present(void) { return 0; }
