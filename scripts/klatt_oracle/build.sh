set -e
cd "$(dirname "$0")"
REF=/root/reference/micro/klatt-tts
G2P=/root/reference/micro/g2p
INC="-I $REF/include -I $REF/include/tts -I $G2P/include -I $G2P/include/g2p -I $G2P/src"
mkdir -p obj
SRCS="main.cc $REF/src/klatt.cc $REF/src/phonemes.cc $REF/src/config.cc $REF/src/synth_internal.cc $REF/src/synth_stream.cc $G2P/src/g2p.cc $G2P/src/g2p_dict.cc $G2P/src/g2p_numbers.cc $G2P/src/g2p_phones.cc $G2P/src/g2p_rules.cc $G2P/src/ipa_tokens.cc"
for f in $SRCS; do
  o=obj/$(basename $f | sed 's/\.[^.]*$//').o
  [ $o -nt $f ] 2>/dev/null && continue
  g++ -std=c++17 -O2 $INC -c -o $o $f
done
g++ -o klatt_oracle obj/*.o
echo BUILD_OK
