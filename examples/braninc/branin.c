/* Branin-Hoo objective in C — exercises the SHELL language path of the
 * runner (reference examples/braninc, SURVEY.md §2 #19).
 *
 * Contract: argv[1] is the job JSON file; the program prints its result
 * as the last float on stdout ("RESULT= <float>").  The job's "X"
 * parameter holds two unit-interval doubles (see examples/braninpy for
 * the domain mapping).
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static double branin(double x1, double x2) {
  const double a = 1.0;
  const double b = 5.1 / (4.0 * M_PI * M_PI);
  const double c = 5.0 / M_PI;
  const double r = 6.0;
  const double s = 10.0;
  const double t = 1.0 / (8.0 * M_PI);
  const double term = x2 - b * x1 * x1 + c * x1 - r;
  return a * term * term + s * (1.0 - t) * cos(x1) + s;
}

/* Minimal extraction of the first "dbl_val": [u, v] array in the job
 * JSON — enough for this objective's single FLOAT parameter. */
static int read_params(const char* path, double* u, double* v) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  char buf[65536];
  size_t n = fread(buf, 1, sizeof(buf) - 1, f);
  fclose(f);
  buf[n] = 0;
  const char* p = strstr(buf, "\"dbl_val\"");
  if (!p) return -1;
  p = strchr(p, '[');
  if (!p) return -1;
  if (sscanf(p, "[ %lf , %lf", u, v) != 2 &&
      sscanf(p, "[%lf,%lf", u, v) != 2 &&
      sscanf(p, "[%lf, %lf", u, v) != 2)
    return -1;
  return 0;
}

int main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s <job-file>\n", argv[0]);
    return 2;
  }
  double u = 0.0, v = 0.0;
  if (read_params(argv[1], &u, &v) != 0) {
    fprintf(stderr, "could not parse params from %s\n", argv[1]);
    return 1;
  }
  const double x1 = -5.0 + 15.0 * u;
  const double x2 = 15.0 * v;
  const double value = branin(x1, x2);
  printf("branin(%f, %f)\n", x1, x2);
  printf("RESULT= %.10f\n", value);
  return 0;
}
