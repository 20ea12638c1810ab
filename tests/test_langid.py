"""Language-ID routing over 25 languages (fasttext lid.176 role,
reference: rapid_doc/model/fast_langdetect/infer.py:24-30).

The sentences below are HELD OUT — none appear in the utils/langid.py
seed corpora; they exercise generalization of the hashed n-gram model,
not memorization. Non-Latin/non-Cyrillic scripts route through the
unicode-script gate in utils/lang.py and are included for end-to-end
coverage of detect_lang."""
from __future__ import annotations

import pytest

from rapiddoc_tpu.utils.lang import detect_lang
from rapiddoc_tpu.utils.langid import classify

LATIN_SAMPLES = {
    "en": "Researchers found that the new method performs better than "
          "existing approaches when the data contains noise.",
    "fr": "Les chercheurs ont montré que la nouvelle méthode fonctionne "
          "mieux lorsque les données contiennent du bruit.",
    "de": "Die Forscher zeigten, dass das neue Verfahren besser "
          "funktioniert, wenn die Daten verrauscht sind.",
    "es": "Los investigadores demostraron que el nuevo método funciona "
          "mejor cuando los datos contienen ruido.",
    "it": "I ricercatori hanno dimostrato che il nuovo metodo funziona "
          "meglio quando i dati contengono rumore.",
    "pt": "Os pesquisadores demonstraram que o novo método funciona "
          "melhor quando os dados contêm ruído.",
    "nl": "De onderzoekers toonden aan dat de nieuwe methode beter werkt "
          "wanneer de gegevens ruis bevatten.",
    "pl": "Badacze wykazali, że nowa metoda działa lepiej, gdy dane "
          "zawierają szum pomiarowy.",
    "cs": "Výzkumníci prokázali, že nová metoda funguje lépe, když data "
          "obsahují šum měření.",
    "sv": "Forskarna visade att den nya metoden fungerar bättre när "
          "uppgifterna innehåller brus.",
    "da": "Forskerne viste, at den nye metode virker bedre, når dataene "
          "indeholder støj fra målingerne.",
    "fi": "Tutkijat osoittivat, että uusi menetelmä toimii paremmin, kun "
          "aineisto sisältää kohinaa.",
    "hu": "A kutatók kimutatták, hogy az új módszer jobban működik, ha "
          "az adatok zajt tartalmaznak.",
    "ro": "Cercetătorii au demonstrat că noua metodă funcționează mai "
          "bine atunci când datele conțin zgomot.",
    "tr": "Araştırmacılar, veriler gürültü içerdiğinde yeni yöntemin "
          "daha iyi çalıştığını gösterdi.",
    "vi": "Các nhà nghiên cứu đã chứng minh rằng phương pháp mới hoạt "
          "động tốt hơn khi dữ liệu có nhiễu.",
    "id": "Para peneliti menunjukkan bahwa metode baru bekerja lebih "
          "baik ketika data mengandung derau.",
}

CYRILLIC_SAMPLES = {
    "ru": "Исследователи показали, что новый метод работает лучше, "
          "когда данные содержат шум измерений.",
    "uk": "Дослідники показали, що новий метод працює краще, коли дані "
          "містять шум вимірювань.",
    "bg": "Изследователите показаха, че новият метод работи по-добре, "
          "когато данните съдържат шум.",
    "sr": "Истраживачи су показали да нови метод ради боље када подаци "
          "садрже шум мерења.",
}

SCRIPT_SAMPLES = {
    "ch": "研究人员发现，当数据包含噪声时，新方法的表现优于现有方法。",
    "japan": "研究者たちは、データにノイズが含まれる場合、新しい手法が"
             "より優れていることを示しました。",
    "korean": "연구자들은 데이터에 노이즈가 포함될 때 새로운 방법이 더 "
              "잘 작동한다는 것을 보여주었다.",
    "arabic": "أظهر الباحثون أن الطريقة الجديدة تعمل بشكل أفضل عندما "
              "تحتوي البيانات على ضوضاء.",
    "th": "นักวิจัยแสดงให้เห็นว่าวิธีการใหม่ทำงานได้ดีกว่าเมื่อข้อมูลมีสัญญาณรบกวน",
    "el": "Οι ερευνητές έδειξαν ότι η νέα μέθοδος λειτουργεί καλύτερα "
          "όταν τα δεδομένα περιέχουν θόρυβο.",
    "devanagari": "शोधकर्ताओं ने दिखाया कि जब डेटा में शोर होता है तो नई "
                  "विधि बेहतर काम करती है।",
}


@pytest.mark.parametrize("lang,text", sorted(LATIN_SAMPLES.items()))
def test_latin_routing(lang, text):
    assert detect_lang(text) == lang


@pytest.mark.parametrize("lang,text", sorted(CYRILLIC_SAMPLES.items()))
def test_cyrillic_routing(lang, text):
    assert detect_lang(text) == lang


@pytest.mark.parametrize("lang,text", sorted(SCRIPT_SAMPLES.items()))
def test_script_routing(lang, text):
    assert detect_lang(text) == lang


def test_classifier_margin_is_confident_on_running_text():
    lang, margin = classify(LATIN_SAMPLES["de"], "latin")
    assert lang == "de" and margin >= 0.05


def test_short_or_empty_text_defaults():
    assert detect_lang("") == "ch"
    assert detect_lang("12345 *** !!!") == "ch"
