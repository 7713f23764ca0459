/* auto-generated */
#define DAV1D_VERSION "1.0.0-c-ref"
