#!/bin/bash
set -e
SRC=/root/reference
CFLAGS="-O2 -g -I$PWD/build -I$SRC -I$SRC/include -I$SRC/include/dav1d -I$PWD/build/dav1d -D_GNU_SOURCE -DNDEBUG -w -std=c11"
mkdir -p obj
# non-template sources
NONTMPL="cdf.c cpu.c data.c decode.c dequant_tables.c getbits.c intra_edge.c itx_1d.c lf_mask.c lib.c log.c mem.c msac.c obu.c picture.c qm.c ref.c refmvs.c scan.c tables.c thread_task.c warpmv.c wedge.c"
for f in $NONTMPL; do
  [ -f obj/${f%.c}.o ] && [ obj/${f%.c}.o -nt $SRC/src/$f ] && continue
  gcc $CFLAGS -c $SRC/src/$f -o obj/${f%.c}.o &
done
wait
# templated sources x2 bitdepths
TMPL="cdef_apply_tmpl.c cdef_tmpl.c fg_apply_tmpl.c filmgrain_tmpl.c ipred_prepare_tmpl.c ipred_tmpl.c itx_tmpl.c lf_apply_tmpl.c loopfilter_tmpl.c looprestoration_tmpl.c lr_apply_tmpl.c mc_tmpl.c recon_tmpl.c"
for f in $TMPL; do
  gcc $CFLAGS -DBITDEPTH=8 -c $SRC/src/$f -o obj/${f%.c}_8.o &
  gcc $CFLAGS -DBITDEPTH=16 -c $SRC/src/$f -o obj/${f%.c}_16.o &
done
wait
# tools
for f in dav1d.c dav1d_cli_parse.c; do
  gcc $CFLAGS -c $SRC/tools/$f -o obj/tool_${f%.c}.o &
done
for f in input/input.c input/ivf.c input/annexb.c input/section5.c output/output.c output/md5.c output/y4m2.c output/yuv.c output/null.c; do
  b=$(basename $f .c)
  gcc $CFLAGS -I$SRC/tools -c $SRC/tools/$f -o obj/tool_${b}.o &
done
wait
gcc obj/*.o -o dav1d_ref -lpthread -lm -ldl
echo BUILD-OK
