"""Peak-analysis operators (SURVEY.md §2): windows, smooth, envelopes,
peaks, attributes, and the reference-exact fidelity route."""
