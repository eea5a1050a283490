set -e
REF=/root/reference/core/moonshine-tts/src
TP=/root/reference/core/third-party
MU=/root/reference/core/moonshine-utils
INC="-I stub -I $REF -I $REF/lang-specific -I $TP -I $TP/utf8proc -I $MU"
mkdir -p obj
SRCS="main.cpp stub/onnx_stubs.cpp $REF/g2p-word-log.cpp $REF/ipa-postprocess.cpp $REF/text-normalize.cpp $REF/utf8-utils.cpp $REF/json-config.cpp $MU/file-information.cpp $MU/file-utils.cpp $MU/string-utils.cpp"
for f in $REF/lang-specific/*.cpp; do case $(basename $f) in *onnx*|g2p-transformer-model.cpp|japanese.cpp) ;; *) SRCS="$SRCS $f";; esac; done
pids=""
for f in $SRCS; do
  o=obj/$(basename $f .cpp).o
  [ $o -nt $f ] 2>/dev/null && continue
  g++ -std=c++20 -O1 $INC -c -o $o $f &
  pids="$pids $!"
  while [ $(jobs -r | wc -l) -ge 8 ]; do wait -n; done
done
wait
g++ -o g2p_oracle obj/*.o utf8proc.o
echo BUILD_OK
