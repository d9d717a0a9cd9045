#!/bin/bash
# GDAL elevation raster -> PLY ground-truth mesh.
# Mirrors /root/reference/gdal2ply/gdal2ply.sh: gdal_translate to XYZ, then
# XYZ -> PLY conversion (xyz2ply.py replaces the Groovy utilities).
set -e

if [ $# -lt 1 ]; then
  echo "Usage: $0 -i=<input raster or .xyz> [-o=<output prefix>]"
  echo "  [-rect=<x,y,w,h>] [-t triangles] [-f flip faces] [-c center]"
  echo "  [-b binary] [-tx texture.png] [-m<x|y|z> mirror axis]"
  exit 1
fi

INPUT=""; OUTPUT=""; EXTRA=(); MIRROR=""; TEXTURE=""
for ARG in "$@"; do
  case "$ARG" in
    -i=*) INPUT="${ARG#-i=}" ;;
    -o=*) OUTPUT="${ARG#-o=}" ;;
    -rect=*) EXTRA+=(--rect "${ARG#-rect=}") ;;
    -t) EXTRA+=(-t) ;;
    -f) EXTRA+=(-f) ;;
    -c) EXTRA+=(-c) ;;
    -b) EXTRA+=(-b) ;;
    -tx=*) TEXTURE="${ARG#-tx=}" ;;
    -mx) MIRROR="${MIRROR}x" ;;
    -my) MIRROR="${MIRROR}y" ;;
    -mz) MIRROR="${MIRROR}z" ;;
  esac
done

XYZ="$INPUT"
if [[ "$INPUT" != *.xyz ]]; then
  if ! command -v gdal_translate >/dev/null; then
    echo "gdal_translate not available; provide a .xyz input instead" >&2
    exit 2
  fi
  XYZ="${INPUT%.*}.xyz"
  gdal_translate -of XYZ "$INPUT" "$XYZ"
fi

CMD=(python "$(dirname "$0")/xyz2ply.py" -i "$XYZ" ${EXTRA[@]})
[ -n "$OUTPUT" ] && CMD+=(-o "$OUTPUT")
[ -n "$MIRROR" ] && CMD+=(--mirror "$MIRROR")
[ -n "$TEXTURE" ] && CMD+=(--texture "$TEXTURE")
"${CMD[@]}"
