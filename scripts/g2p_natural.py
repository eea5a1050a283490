#!/usr/bin/env python
"""Natural-sentence G2P parity corpora + reference-oracle goldens.

VERDICT r4 weak #3: the bulk agreement corpora are generator-built
(number grids, punctuation grids, trigram pseudo-words), so "100%"
measured engine parity on a synthetic distribution.  This script scores
the same engine pair on NATURAL RUNNING TEXT: ~18 original sentences per
dialect (authored for this project — everyday prose with the dialect's
real orthography: elisions, umlauts, clitics, case endings, digits in
context), goldened through the compiled reference oracle
(scripts/g2p_oracle, unmodified reference sources) and scored by the
same word-agreement metric as the bulk table.

Outputs: tests/data/g2p_ref/natural/<dialect>.{txt,golden.tsv}
Score:    python scripts/g2p_natural.py --score-only
Ratchet:  tests/test_g2p_natural.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DATA = REPO / "tests" / "data" / "g2p_ref"
NATURAL = DATA / "natural"

# Original prose, written for this corpus.  Each dialect: everyday
# sentences exercising its real orthography and morphology.
SENTENCES: dict[str, list[str]] = {
    "en": [
        "The morning train was late again, so she walked along the river instead.",
        "He poured two cups of coffee and carried them carefully upstairs.",
        "Our neighbours painted their front door a surprising shade of green.",
        "The library closes early on Fridays during the summer months.",
        "A sudden storm scattered the papers across the whole office.",
        "They argued about the quickest route to the airport for twenty minutes.",
        "The bakery on the corner still makes bread the old-fashioned way.",
        "She learned to repair bicycles from her grandfather years ago.",
        "Nobody expected the small museum to be so crowded on a Tuesday.",
        "The children built an enormous sandcastle before the tide came in.",
        "His handwriting is almost impossible to read without strong glasses.",
        "We planted tomatoes and basil in the garden behind the house.",
        "The orchestra rehearsed the same passage until midnight.",
        "A thin layer of ice covered the pond by the time we arrived.",
        "She answered every question calmly, though her hands were shaking.",
        "The ferry crossing takes about forty minutes in good weather.",
        "Their dog buried the remote control under the rose bushes.",
        "I finally finished the novel I started reading last winter.",
    ],
    "de": [
        "Der Zug nach München hatte heute wieder zwanzig Minuten Verspätung.",
        "Sie stellte die Blumen vorsichtig auf den kleinen Küchentisch.",
        "Am Wochenende wandern wir gern durch den dunklen Wald hinter dem Dorf.",
        "Die Straßenbahn war so voll, dass wir lieber zu Fuß gingen.",
        "Mein Bruder übt jeden Abend eine Stunde lang Klavier.",
        "Das alte Rathaus wurde im letzten Jahr aufwendig renoviert.",
        "Im Herbst fallen die Blätter früher als gewöhnlich.",
        "Könntest du bitte das Fenster schließen, es zieht furchtbar.",
        "Die Kinder bauten im Garten eine Höhle aus Decken und Stühlen.",
        "Wir haben gestern einen außergewöhnlich guten Käsekuchen gegessen.",
        "Der Schlüssel liegt wahrscheinlich noch in der Jackentasche.",
        "Ohne Wörterbuch verstehe ich diesen schwierigen Text nicht.",
        "Die Nachbarn grillen jeden Sonntag auf ihrem Balkon.",
        "Sie erzählte eine lange Geschichte über ihre Reise nach Österreich.",
        "Das Museum öffnet erst um zehn Uhr, wir müssen warten.",
        "Ein kalter Wind wehte über die leeren Felder.",
        "Er repariert alte Uhren in seiner kleinen Werkstatt.",
        "Vergiss nicht, die Pflanzen im Wohnzimmer zu gießen.",
    ],
    "fr": [
        "Le boulanger ouvre sa boutique tous les matins à six heures.",
        "Elle a oublié son parapluie dans le train de banlieue.",
        "Nous avons marché longtemps le long de la rivière gelée.",
        "L'orage a éclaté juste avant la fin du marché.",
        "Ils habitent une petite maison près de l'ancienne gare.",
        "Je ne trouve plus mes lunettes, les as-tu vues quelque part ?",
        "Les enfants ramassaient des châtaignes sous les grands arbres.",
        "Ce restaurant propose un menu différent chaque semaine.",
        "Elle apprend le violon depuis l'âge de sept ans.",
        "Le facteur est passé très tôt ce matin, avant le lever du soleil.",
        "Nous préparons une soupe de légumes avec les restes du jardin.",
        "La bibliothèque municipale ferme exceptionnellement cet après-midi.",
        "Il pleuvait tellement que la rue ressemblait à un ruisseau.",
        "Mon grand-père racontait toujours la même histoire de pêche.",
        "Le chat du voisin dort sur notre muret toute la journée.",
        "Nous avons raté la correspondance à cause d'un quai fermé.",
        "Elle a cousu elle-même les rideaux de la chambre.",
        "Le spectacle commence à vingt heures précises.",
    ],
    "es_es": [
        "El panadero madruga cada día para encender el horno de leña.",
        "Perdimos el autobús por culpa de un semáforo estropeado.",
        "La abuela guarda las fotografías antiguas en una caja de latón.",
        "Los niños jugaban en la plaza hasta que anochecía.",
        "Este invierno ha llovido mucho más que el año pasado.",
        "Ella estudia ingeniería en una universidad pequeña del norte.",
        "El mercado de los jueves llena el pueblo de ruido y colores.",
        "No encuentro las llaves que dejé sobre la mesa del salón.",
        "Mi vecino cultiva tomates y pimientos en la azotea.",
        "El tren con destino a Sevilla sale del andén número tres.",
        "Aquella película nos pareció demasiado larga y confusa.",
        "Los pescadores vuelven al puerto antes del mediodía.",
        "Hemos pintado la valla del jardín de un azul muy claro.",
        "La orquesta ensayó la misma pieza durante toda la tarde.",
        "Se me olvidó comprar aceitunas para la cena de esta noche.",
        "El museo permanece cerrado los lunes por la mañana.",
        "Caminamos despacio porque la cuesta era muy empinada.",
        "La tormenta derribó varios árboles del parque central.",
    ],
    "es_mx": [
        "En el mercado venden elotes asados con chile y limón.",
        "Mi tía prepara tamales cada diciembre para toda la familia.",
        "El camión tardó media hora en llegar a la parada.",
        "Los mariachis tocaron hasta muy entrada la noche.",
        "Fuimos a la playa y regresamos quemados por el sol.",
        "El niño quiere aprender a andar en bicicleta este verano.",
        "La señora de la esquina vende las mejores quesadillas del barrio.",
        "Se descompuso el refrigerador justo antes de la fiesta.",
        "Mañana temprano salimos rumbo a Guadalajara en carretera.",
        "Mi abuelo platica historias de cuando trabajaba en el campo.",
        "Las jacarandas pintan de morado las calles en primavera.",
        "No alcanzamos boletos para la función de la tarde.",
        "El pozole de la cena estaba delicioso aunque muy picoso.",
        "Dejé el celular cargando en la cocina toda la noche.",
        "Los albañiles terminaron la barda antes de que lloviera.",
        "En la esquina pusieron un puesto nuevo de jugos naturales.",
        "La maestra encargó una maqueta del sistema solar.",
        "El perro del vecino ladra cada vez que pasa el cartero.",
    ],
    "it": [
        "Il fornaio del quartiere sforna il pane alle sei in punto.",
        "Abbiamo perso il traghetto per pochi minuti di ritardo.",
        "La nonna prepara il ragù ogni domenica mattina.",
        "I bambini giocavano a pallone nel cortile della scuola.",
        "Questo inverno è nevicato due volte anche in pianura.",
        "Non trovo più gli occhiali che avevo lasciato sul tavolo.",
        "Il treno per Firenze parte dal secondo binario.",
        "Mia sorella studia architettura a Venezia da tre anni.",
        "Il temporale ha allagato la piazza in pochi minuti.",
        "Abbiamo raccolto le olive con tutta la famiglia.",
        "La biblioteca resta chiusa il lunedì pomeriggio.",
        "Il gatto dorme sempre sul davanzale della cucina.",
        "Hanno ridipinto la facciata del municipio di giallo chiaro.",
        "L'orchestra ha provato lo stesso brano fino a mezzanotte.",
        "Domani andiamo al mercato a comprare il pesce fresco.",
        "La strada per il paese è piena di curve strette.",
        "Ho dimenticato l'ombrello sull'autobus delle otto.",
        "Il profumo del caffè riempiva tutta la casa.",
    ],
    "nl": [
        "De bakker op de hoek verkoopt nog echt ouderwets roggebrood.",
        "We fietsten tegen de wind in naar het strand.",
        "Mijn buurman maait elke zaterdag stipt om negen uur het gras.",
        "De trein naar Utrecht was door een storing flink vertraagd.",
        "Ze vergat haar sleutels weer op het aanrecht in de keuken.",
        "In de herfst rapen de kinderen kastanjes onder de oude bomen.",
        "Het museum is op maandagochtend helaas gesloten.",
        "We schaatsten vroeger op de sloot achter de boerderij.",
        "De kat van de buren slaapt het liefst in onze vensterbank.",
        "Hij repareert oude radio's in het schuurtje achter het huis.",
        "Morgen komt de loodgieter eindelijk de kraan vervangen.",
        "Het regende zo hard dat de straat blank stond.",
        "Oma breit elke winter dikke wanten voor de kleinkinderen.",
        "De brug stond open, dus we misten de afspraak.",
        "We plukten bramen langs het fietspad naar het dorp.",
        "De juf las elke middag een hoofdstuk voor uit hetzelfde boek.",
        "Op koningsdag kleurt de hele stad oranje.",
        "Hij vergat alweer de vuilniszakken buiten te zetten.",
    ],
    "pt_pt": [
        "O padeiro acende o forno antes do nascer do sol.",
        "Perdemos o comboio das oito por causa do trânsito.",
        "A avó guarda as receitas antigas numa gaveta da cozinha.",
        "As crianças brincavam no largo até ao anoitecer.",
        "Este inverno choveu muito mais do que o costume.",
        "Não encontro os óculos que deixei em cima da mesa.",
        "O mercado municipal enche-se de gente ao sábado.",
        "A minha irmã estuda medicina em Coimbra há quatro anos.",
        "O vento derrubou duas árvores na avenida principal.",
        "Fomos apanhar castanhas ao pinhal do vizinho.",
        "A biblioteca fecha à segunda-feira de manhã.",
        "O gato dorme sempre no parapeito da janela.",
        "Pintaram a fachada da junta de freguesia de azul.",
        "O elétrico vinha tão cheio que seguimos a pé.",
        "Amanhã vamos à praça comprar peixe fresco.",
        "A estrada para a aldeia está cheia de curvas apertadas.",
        "Esqueci-me do guarda-chuva no autocarro da tarde.",
        "O cheiro do café encheu a casa toda.",
    ],
    "pt_br": [
        "O padeiro da esquina assa pão francês a manhã inteira.",
        "Perdemos o ônibus porque o sinal ficou fechado demais.",
        "A vovó guarda as fotografias antigas numa lata de biscoitos.",
        "As crianças soltavam pipa no campinho atrás da igreja.",
        "Choveu tanto que o rio quase transbordou ontem à noite.",
        "Minha irmã estuda engenharia numa faculdade do interior.",
        "A feira de domingo toma a rua inteira com barracas coloridas.",
        "Não acho as chaves que deixei em cima da geladeira.",
        "O vizinho planta couve e alface no quintal de casa.",
        "O voo para Recife atrasou quase duas horas.",
        "Aquele filme nos pareceu comprido e meio confuso.",
        "Os pescadores voltam para o porto antes do meio-dia.",
        "Pintamos o muro do quintal de um verde bem claro.",
        "A banda ensaiou a mesma música a tarde toda.",
        "Esqueci de comprar farofa para o almoço de domingo.",
        "O museu fica fechado nas manhãs de segunda-feira.",
        "Subimos a ladeira devagar por causa do calor.",
        "O temporal derrubou a cerca do campo de futebol.",
    ],
    "ru": [
        "Утром за окном медленно падал первый снег.",
        "Бабушка хранит старые письма в жестяной коробке.",
        "Поезд на Казань отправляется с третьего пути.",
        "Дети лепили снеговика во дворе до самого вечера.",
        "Я забыл зонтик в автобусе по дороге домой.",
        "Сосед чинит старые часы в маленькой мастерской.",
        "Библиотека по понедельникам закрыта на учёт.",
        "Мы долго шли вдоль замёрзшей реки к деревне.",
        "Кошка спит на подоконнике почти весь день.",
        "Гроза повалила несколько деревьев в городском парке.",
        "Сестра учится на врача в другом городе.",
        "На рынке по четвергам продают свежую рыбу.",
        "Мы посадили помидоры и укроп на даче.",
        "Оркестр репетировал одну и ту же пьесу до полуночи.",
        "Хлеб в этой пекарне пекут по старому рецепту.",
        "Ветер гнал сухие листья по пустой площади.",
        "Не забудь полить цветы в гостиной.",
        "Паром идёт до острова около сорока минут.",
    ],
    "uk": [
        "Вранці за вікном повільно падав перший сніг.",
        "Бабуся зберігає старі листи в бляшаній коробці.",
        "Потяг до Львова відправляється з другої колії.",
        "Діти ліпили сніговика у дворі до самого вечора.",
        "Я забув парасольку в автобусі дорогою додому.",
        "Сусід лагодить старі годинники у маленькій майстерні.",
        "Бібліотека по понеділках зачинена для читачів.",
        "Ми довго йшли вздовж замерзлої річки до села.",
        "Кіт спить на підвіконні майже цілий день.",
        "Гроза повалила кілька дерев у міському парку.",
        "Сестра навчається на лікаря в іншому місті.",
        "На ринку щочетверга продають свіжу рибу.",
        "Ми посадили помідори та кріп на городі.",
        "Оркестр репетирував ту саму п'єсу до півночі.",
        "Хліб у цій пекарні печуть за давнім рецептом.",
        "Вітер гнав сухе листя порожньою площею.",
        "Не забудь полити квіти у вітальні.",
        "Пором іде до острова близько сорока хвилин.",
    ],
    "tr": [
        "Fırıncı her sabah güneş doğmadan işe başlıyor.",
        "Otobüsü kaçırdığımız için istasyona kadar yürüdük.",
        "Büyükannem eski fotoğrafları teneke bir kutuda saklar.",
        "Çocuklar akşama kadar parkta top oynadılar.",
        "Bu kış geçen yıldan çok daha fazla kar yağdı.",
        "Masanın üzerine bıraktığım gözlüğü bulamıyorum.",
        "Perşembe günleri kurulan pazar sokağı renklendirir.",
        "Kardeşim üç yıldır İzmir'de mimarlık okuyor.",
        "Fırtına parktaki birkaç ağacı devirdi.",
        "Komşumuz balkonda domates ve biber yetiştiriyor.",
        "Müze pazartesi sabahları ziyarete kapalı.",
        "Kedi bütün gün mutfak penceresinde uyuyor.",
        "Belediye binasının cephesini açık sarıya boyadılar.",
        "Orkestra aynı parçayı gece yarısına kadar çalıştı.",
        "Yarın pazardan taze balık almaya gideceğiz.",
        "Köye giden yol keskin virajlarla dolu.",
        "Şemsiyemi sabah otobüsünde unutmuşum.",
        "Kahve kokusu bütün evi doldurdu.",
    ],
    "ko": [
        "아침마다 골목 빵집에서 갓 구운 빵 냄새가 난다.",
        "버스를 놓쳐서 역까지 걸어가기로 했다.",
        "할머니는 오래된 사진을 철제 상자에 보관하신다.",
        "아이들은 해가 질 때까지 운동장에서 공을 찼다.",
        "올겨울에는 작년보다 눈이 훨씬 많이 내렸다.",
        "식탁 위에 두었던 안경이 보이지 않는다.",
        "목요일마다 열리는 시장이 동네를 시끌벅적하게 만든다.",
        "동생은 삼 년째 부산에서 건축을 공부하고 있다.",
        "태풍이 공원의 나무 몇 그루를 쓰러뜨렸다.",
        "이웃집은 옥상에서 고추와 상추를 기른다.",
        "박물관은 월요일 오전에 문을 열지 않는다.",
        "고양이는 하루 종일 부엌 창가에서 잠을 잔다.",
        "시청 건물 외벽을 밝은 회색으로 새로 칠했다.",
        "악단은 자정까지 같은 곡을 연습했다.",
        "내일은 시장에 가서 싱싱한 생선을 살 것이다.",
        "마을로 가는 길은 급한 굽이가 많다.",
        "아침 버스에 우산을 두고 내렸다.",
        "커피 향기가 온 집 안에 가득했다.",
    ],
    "vi": [
        "Mỗi sáng tiệm bánh đầu ngõ thơm mùi bánh mì mới.",
        "Chúng tôi lỡ chuyến xe nên đành đi bộ ra ga.",
        "Bà tôi cất những bức ảnh cũ trong chiếc hộp thiếc.",
        "Bọn trẻ đá bóng ngoài sân đến tận lúc trời tối.",
        "Mùa đông năm nay mưa nhiều hơn hẳn năm ngoái.",
        "Tôi không tìm thấy cặp kính để quên trên bàn.",
        "Chợ phiên thứ năm làm con phố nhộn nhịp hẳn lên.",
        "Em gái tôi học kiến trúc ở Đà Nẵng đã ba năm.",
        "Cơn bão làm đổ mấy cây lớn trong công viên.",
        "Nhà hàng xóm trồng rau thơm trên sân thượng.",
        "Bảo tàng đóng cửa vào sáng thứ hai hằng tuần.",
        "Con mèo nằm ngủ cả ngày bên cửa sổ bếp.",
        "Người ta vừa sơn lại mặt tiền trụ sở màu vàng nhạt.",
        "Dàn nhạc tập đi tập lại một bản đến tận khuya.",
        "Ngày mai chúng tôi ra chợ mua cá tươi.",
        "Đường về làng quanh co với nhiều khúc cua gắt.",
        "Tôi bỏ quên chiếc ô trên chuyến xe buổi sáng.",
        "Mùi cà phê lan khắp cả căn nhà nhỏ.",
    ],
    "hi": [
        "सुबह की पहली बस हमेशा भरी हुई आती है।",
        "दादी पुरानी चिट्ठियाँ एक टीन के डिब्बे में रखती हैं।",
        "बच्चे शाम तक मैदान में गेंद खेलते रहे।",
        "इस साल पहाड़ों पर पिछले साल से ज़्यादा बर्फ़ गिरी।",
        "मेज़ पर रखा चश्मा अब मिल नहीं रहा है।",
        "गुरुवार का बाज़ार पूरे मोहल्ले को रौनक से भर देता है।",
        "मेरी बहन तीन साल से जयपुर में वास्तुकला पढ़ रही है।",
        "आँधी ने बगीचे के कई पेड़ गिरा दिए।",
        "पड़ोसी छत पर मिर्च और धनिया उगाते हैं।",
        "संग्रहालय सोमवार की सुबह बंद रहता है।",
        "बिल्ली दिन भर रसोई की खिड़की पर सोती रहती है।",
        "नगरपालिका भवन की दीवारें हल्के पीले रंग से पुती हैं।",
        "मंडली आधी रात तक वही धुन बजाती रही।",
        "कल हम मंडी से ताज़ी सब्ज़ियाँ लाएँगे।",
        "गाँव की सड़क पर तीखे मोड़ बहुत हैं।",
        "मैं सुबह की बस में छाता भूल गया।",
        "कॉफ़ी की खुशबू पूरे घर में फैल गई।",
        "बारिश इतनी तेज़ थी कि गली नदी जैसी लगने लगी।",
    ],
    "ar": [
        "يفتح الخباز دكانه كل صباح قبل شروق الشمس.",
        "فاتنا القطار فمشينا على طول النهر إلى المحطة.",
        "تحتفظ جدتي بالرسائل القديمة في صندوق معدني صغير.",
        "لعب الأطفال في الساحة حتى غروب الشمس.",
        "أمطرت هذا الشتاء أكثر من العام الماضي بكثير.",
        "لا أجد النظارة التي تركتها على طاولة المطبخ.",
        "سوق الخميس يملأ الحي بالألوان والأصوات.",
        "تدرس أختي الهندسة في جامعة صغيرة في الشمال.",
        "أسقطت العاصفة عدة أشجار في الحديقة العامة.",
        "يزرع جارنا الطماطم والنعناع فوق سطح البيت.",
        "يغلق المتحف أبوابه صباح كل اثنين.",
        "تنام القطة طوال النهار قرب نافذة المطبخ.",
        "طلوا واجهة البلدية بلون أصفر فاتح.",
        "تدربت الفرقة على المقطوعة نفسها حتى منتصف الليل.",
        "سنذهب غدا إلى السوق لشراء سمك طازج.",
        "الطريق إلى القرية مليء بالمنعطفات الضيقة.",
        "نسيت مظلتي في حافلة الصباح.",
        "ملأت رائحة القهوة أرجاء البيت كله.",
    ],
}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--langs", nargs="*", default=sorted(SENTENCES))
    ap.add_argument("--score-only", action="store_true")
    args = ap.parse_args(argv)

    sys.path.insert(0, str(REPO))
    from g2p_bulk import ORACLE, run_oracle  # same oracle plumbing

    NATURAL.mkdir(exist_ok=True)
    if not args.score_only:
        if not ORACLE.exists():
            print("build the oracle first: bash scripts/g2p_oracle/build.sh",
                  file=sys.stderr)
            return 1
        for d in args.langs:
            lines = SENTENCES[d]
            ipa = run_oracle(d, lines)
            (NATURAL / f"{d}.txt").write_text(
                "\n".join(lines) + "\n", encoding="utf-8")
            with (NATURAL / f"{d}.golden.tsv").open(
                    "w", encoding="utf-8") as f:
                for t, i in zip(lines, ipa):
                    f.write(f"{t}\t{i}\n")
            print(f"{d}: {len(lines)} sentences", file=sys.stderr)

    from moonshine_tpu.eval.g2p_reference_agreement import score_language

    print(f"{'dialect':8} {'lines':>5} {'words':>6} {'agree':>7} "
          f"{'charsim':>8}")
    total = 0.0
    for d in args.langs:
        s = score_language(d, data_dir=NATURAL)
        total += s.word_agreement
        print(f"{d:8} {s.lines:>5} {s.ref_words:>6} "
              f"{s.word_agreement:>7.2%} {s.char_similarity:>8.3f}")
    print(f"{'MEAN':8} {'':>5} {'':>6} {total / len(args.langs):>7.2%}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    raise SystemExit(main())
