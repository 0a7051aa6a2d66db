/* Native GRO coordinate parser — the data-loader hot path in C.
 *
 * The reference delegates file IO to OpenMM's C++ loaders; here the fixed-
 * column numeric block of a .gro file (positions + optional velocities,
 * reference grofile.py semantics) is parsed by this small C library, loaded
 * through ctypes with a pure-Python fallback (models/grofile.py).
 *
 * GRO fixed columns per atom line (GROMACS manual):
 *   resid(5) resname(5) atomname(5) atomid(5) x(8.3) y(8.3) z(8.3)
 *   [vx(8.4) vy(8.4) vz(8.4)]
 */
#include <stddef.h>
#include <stdlib.h>

static double parse_fixed(const char *p, int width, int *ok) {
    /* strtod within a fixed-width field; blanks fine, newline = missing */
    char buf[32];
    int n = 0;
    for (int i = 0; i < width && n < 31; i++) {
        char c = p[i];
        if (c == '\0' || c == '\n' || c == '\r') { break; }
        buf[n++] = c;
    }
    buf[n] = '\0';
    if (n == 0) { *ok = 0; return 0.0; }
    char *end = NULL;
    double v = strtod(buf, &end);
    *ok = (end != buf);
    return v;
}

/* Parse n_atoms coordinate lines starting at `text` (the third line of the
 * file).  Writes positions (n,3) and velocities (n,3, zero when absent).
 * Returns the number of atoms parsed, or -k on a malformed line k+1. */
long parse_gro_block(const char *text, long n_atoms, double *pos,
                     double *vel, int *has_vel) {
    const char *p = text;
    *has_vel = 0;
    for (long i = 0; i < n_atoms; i++) {
        /* find line length */
        const char *eol = p;
        while (*eol && *eol != '\n') eol++;
        long len = eol - p;
        if (len < 44) return -i;
        int ok1, ok2, ok3;
        pos[3 * i + 0] = parse_fixed(p + 20, 8, &ok1);
        pos[3 * i + 1] = parse_fixed(p + 28, 8, &ok2);
        pos[3 * i + 2] = parse_fixed(p + 36, 8, &ok3);
        if (!(ok1 && ok2 && ok3)) return -i;
        if (len >= 68) {
            vel[3 * i + 0] = parse_fixed(p + 44, 8, &ok1);
            vel[3 * i + 1] = parse_fixed(p + 52, 8, &ok2);
            vel[3 * i + 2] = parse_fixed(p + 60, 8, &ok3);
            if (ok1 && ok2 && ok3) *has_vel = 1;
        } else {
            vel[3 * i + 0] = vel[3 * i + 1] = vel[3 * i + 2] = 0.0;
        }
        p = (*eol == '\n') ? eol + 1 : eol;
    }
    return n_atoms;
}

/* Native DCD frame encoder — trajectory-writer hot path in C.
 *
 * Produces one complete CHARMM DCD frame (unit-cell record + X/Y/Z f32
 * coordinate records with Fortran markers) from (n,3) nm positions:
 * the nm->Angstrom conversion and AoS->SoA transpose happen here instead
 * of three numpy passes.  Returns bytes written.
 */
long encode_dcd_frame(const float *xyz_nm, long n, const double *box_nm,
                      char *out) {
    char *p = out;
    /* unit-cell record: a, gamma, b, beta, alpha, c (cosines = 0) */
    *(int *)p = 48; p += 4;
    double cell[6] = {box_nm[0] * 10.0, 0.0, box_nm[1] * 10.0,
                      0.0, 0.0, box_nm[2] * 10.0};
    for (int i = 0; i < 6; i++) { *(double *)p = cell[i]; p += 8; }
    *(int *)p = 48; p += 4;
    for (int axis = 0; axis < 3; axis++) {
        *(int *)p = (int)(4 * n); p += 4;
        float *dst = (float *)p;
        for (long i = 0; i < n; i++)
            dst[i] = xyz_nm[3 * i + axis] * 10.0f;
        p += 4 * n;
        *(int *)p = (int)(4 * n); p += 4;
    }
    return (long)(p - out);
}
