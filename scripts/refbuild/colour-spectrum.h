/* Minimal stand-in for the reference's generated colour-spectrum.h
 * (Makefile:183-186 runs scripts/colour-gen, a Python-2 script not
 * runnable in this image).  The tables only colour the -h heat map;
 * cross-entropy numbers are unaffected.  Two no-op entries keep the
 * indexing code well-defined. */
#ifndef COLOUR_SPECTRUM_H
#define COLOUR_SPECTRUM_H
static const char *COLOURS_24[] = {"", ""};
#define N_COLOURS_24 2
static const char *COLOURS_256[] = {"", ""};
#define N_COLOURS_256 2
#endif
